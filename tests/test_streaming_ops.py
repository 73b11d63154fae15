"""Streaming dedup / enrichment / stream-stream join
(streaming/dedup_join.py): AvailableNow drains over file sources must
reproduce the batch result on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.streaming.dedup_join import (
    dedup_stream,
    enrich_stream,
    interval_join,
)
from lakehouse_file_format_compare_spark.streaming.stateful import drain_available_now

from .conftest import SF_SMOKE

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev_ops"))
    ev = table(spark, SF_SMOKE, "events").where(F.col("user_id") < 40)
    base = ev.select("event_id", "ts", "user_id", "event_type", "value")
    # inject exact duplicates (same event_id) arriving in a separate file
    dupes = base.where(F.col("event_id") % 7 == 0)
    base.write.mode("overwrite").parquet(src)
    dupes.write.mode("append").parquet(src)
    return src


def _drain(spark, df, name, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_{name}"))
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    return spark.table(name)


def test_stream_dedup_matches_batch(spark, events_src, tmp_path_factory):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_src)
    out = _drain(
        spark, dedup_stream(stream, keys=("event_id",)), "dedup_out", tmp_path_factory
    )
    got = sorted(r.event_id for r in out.select("event_id").collect())
    want = sorted(
        r.event_id
        for r in spark.read.parquet(events_src).dropDuplicates(["event_id"]).collect()
    )
    assert got == want
    # and the duplicates were actually present pre-dedup
    assert len(got) < spark.read.parquet(events_src).count()


def test_stream_static_enrichment(spark, events_src, tmp_path_factory):
    dim = spark.createDataFrame(
        [("purchase", True), ("signup", True), ("view", False),
         ("click", False), ("logout", False)],
        "event_type string, is_financial boolean",
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_src)
    out = _drain(
        spark, enrich_stream(stream, dim, "event_type"), "enrich_out", tmp_path_factory
    )
    want = spark.read.parquet(events_src).join(dim, "event_type")
    assert out.count() == want.count()
    got_fin = out.where("is_financial").count()
    assert got_fin == want.where("is_financial").count()


def test_stream_stream_interval_join_matches_batch(spark, events_src, tmp_path_factory):
    reader = lambda: spark.readStream.schema(EVENTS_SCHEMA).parquet(events_src)  # noqa: E731
    left = reader().where(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"), F.col("ts").alias("signup_ts")
    ).withColumnRenamed("u", "user_id")
    right = reader().where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = interval_join(
        left, right, key="user_id", left_ts="signup_ts", right_ts="purchase_ts",
        lower_sec=0, upper_sec=3600, delay="30 minutes",
    ).select(left["user_id"].alias("user_id"), "signup_ts", "purchase_ts", "purchase_value")
    out = _drain(spark, joined, "ssj_out", tmp_path_factory)

    ev = spark.read.parquet(events_src).dropDuplicates(["event_id"])
    bl = ev.where(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("ts").alias("signup_ts")
    )
    br = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = bl.join(
        br,
        (bl.user_id == br.r_user)
        & (br.purchase_ts >= bl.signup_ts)
        & (br.purchase_ts <= bl.signup_ts + F.expr("INTERVAL 3600 SECONDS")),
    ).select("user_id", "signup_ts", "purchase_ts", "purchase_value")

    got = sorted(map(tuple, out.collect()))
    # streaming side sees the duplicate-injected files: joins of dup
    # rows produce dup pairs, so compare AFTER dedup on both sides
    got_set = sorted(set(got))
    want_set = sorted(set(map(tuple, want.collect())))
    assert got_set == want_set
    assert len(got_set) > 0
