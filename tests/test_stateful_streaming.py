"""applyInPandasWithState sessionization: the streaming operator's
closed sessions must match the batch oracle's non-final sessions."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.schemas import TESTDATA_SCHEMAS
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.streaming.stateful import (
    drain_available_now,
    sessionize_batch,
    sessionize_stream,
)

from .conftest import SF_SMOKE

GAP = 1800  # 30 min → several sessions per user over the 30-day window


@pytest.fixture(scope="module")
def events_subset(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_src"))
    events = table(spark, SF_SMOKE, "events").where(F.col("user_id") < 10)
    events.select("user_id", "ts", "value").write.mode("overwrite").parquet(src)
    return src


def test_streaming_sessions_match_batch(spark, events_subset, tmp_path_factory):
    schema = "user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).parquet(events_subset)
    out = sessionize_stream(stream, gap_seconds=GAP)
    ckpt = str(tmp_path_factory.mktemp("ckpt_sess"))
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in spark.table("sessions_out").collect()
    }

    batch = sessionize_batch(
        spark.read.parquet(events_subset), gap_seconds=GAP
    )
    # the streaming run (single AvailableNow drain) emits every CLOSED
    # session; each user's final session stays in the state store
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed_only = (
        batch.withColumn("rn", F.row_number().over(w)).where(F.col("rn") > 1).drop("rn")
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in closed_only.collect()
    }
    assert got == want
    assert len(got) > 10


def test_transform_with_state_sessions_match_batch(spark, events_subset, tmp_path_factory):
    """The Spark-4 StatefulProcessor variant must produce exactly the
    same closed sessions as the applyInPandasWithState operator and
    the batch oracle. Needs the RocksDB state store provider (the
    only provider transformWithState supports) AND a working protobuf
    (the TWS Python runner speaks proto to the JVM; this container
    ships none — measured r5: the runner dies with ImportError on
    google.protobuf — so the operator stays wired and this test skips
    until the dependency exists)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("transformWithStateInPandas needs protobuf (absent in this container)")
    from lakehouse_file_format_compare_spark.streaming.stateful import (
        sessionize_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = "user_id long, ts timestamp, value double"
        stream = spark.readStream.schema(schema).parquet(events_subset)
        out = sessionize_stream_tws(stream, gap_seconds=GAP)
        ckpt = str(tmp_path_factory.mktemp("ckpt_tws"))
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_tws")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
            for r in spark.table("sessions_tws").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    batch = sessionize_batch(spark.read.parquet(events_subset), gap_seconds=GAP)
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed_only = (
        batch.withColumn("rn", F.row_number().over(w)).where(F.col("rn") > 1).drop("rn")
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in closed_only.collect()
    }
    assert got == want
    assert len(got) > 10
