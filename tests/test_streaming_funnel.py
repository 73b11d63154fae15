"""Streaming funnel (streaming/funnel_stream.py): incremental
chained-min funnels must match the batch operator
(operators/funnel.py::funnel_user_steps) on multi-batch replays —
including out-of-order arrival, where a late early-step event
retroactively revives a candidate a naive chain-only state would
have discarded — and the watermark must bound candidate state."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.funnel import funnel_user_steps
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.streaming.funnel_stream import funnel_stream
from lakehouse_file_format_compare_spark.streaming.stateful import drain_available_now

from .conftest import SF_SMOKE

STEPS = ["signup", "view", "purchase"]
EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"
TS = dt.datetime


def _drain_update(spark, df, name, tmp_path_factory, last_progress=False):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_{name}"))
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    out = spark.table(name)
    return (out, q.lastProgress) if last_progress else out


def _final_rows(updates_df):
    """Max-emit_seq row per user = the drain's final chain."""
    w = F.struct(F.col("emit_seq"))
    return (
        updates_df.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct(*[f"step{i}_ts" for i in range(1, len(STEPS) + 1)], "n_candidates"),
                w,
            ).alias("s")
        )
        .select("user_id", "s.*")
    )


def _chains(df, n=len(STEPS)):
    cols = ["user_id"] + [f"step{i}_ts" for i in range(1, n + 1)]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def shuffled_events_src(spark, tmp_path_factory):
    """sf0.001 events written as 6 files sliced by event_id hash —
    every micro-batch mixes early and late event times, the
    out-of-order regime the candidate state exists for."""
    src = str(tmp_path_factory.mktemp("ev_funnel_shuffled"))
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    for i in range(6):
        (
            ev.where(F.pmod(F.xxhash64("event_id"), F.lit(6)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.05)
    return src


def test_stream_funnel_matches_batch_on_shuffled_batches(
    spark, shuffled_events_src, tmp_path_factory
):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(shuffled_events_src)
    )
    out = _drain_update(
        spark,
        funnel_stream(stream, STEPS, max_span_seconds=7 * 86400),
        "funnel_shuffled",
        tmp_path_factory,
    )
    got = _chains(_final_rows(out))
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(shuffled_events_src)
    want = _chains(funnel_user_steps(ev, STEPS, max_span_seconds=7 * 86400))
    assert got == want


def test_stream_funnel_late_signup_revives_discarded_view(
    spark, tmp_path_factory
):
    """The case that breaks chain-only state: batch 1 has
    signup@10:00 + view@09:30 (view precedes the chain, unusable);
    batch 2 delivers a LATE signup@09:00 — the correct chain is then
    (09:00, 09:30), requiring the 09:30 view to have been RETAINED."""
    src = str(tmp_path_factory.mktemp("ev_funnel_late"))
    b1 = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0), 7, "signup"), (2, TS(2024, 1, 1, 9, 30), 7, "view")],
        EVENTS_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [(3, TS(2024, 1, 1, 9, 0), 7, "signup")], EVENTS_SCHEMA
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes -> file-source replays b1 first
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = _drain_update(
        spark, funnel_stream(stream, ["signup", "view"]), "funnel_late", tmp_path_factory
    )
    final = (
        _final_rows(out.withColumn("step3_ts", F.lit(None).cast("timestamp")))
        .collect()
    )
    assert len(final) == 1
    assert final[0]["step1_ts"] == TS(2024, 1, 1, 9, 0)
    assert final[0]["step2_ts"] == TS(2024, 1, 1, 9, 30)


@pytest.fixture(scope="module")
def ordered_events_src(spark, tmp_path_factory):
    """sf0.001 events as 10 time-ordered slices, so the watermark
    advances between micro-batches and pruning actually engages."""
    from pyspark.sql import Window

    src = str(tmp_path_factory.mktemp("ev_funnel_ordered"))
    ev = (
        table(spark, SF_SMOKE, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .withColumn("__rn", F.row_number().over(Window.partitionBy().orderBy("ts")))
    )
    n = ev.count()
    per = -(-n // 10)
    cached = ev.cache()
    try:
        for i in range(10):
            (
                cached.where((F.col("__rn") > i * per) & (F.col("__rn") <= (i + 1) * per))
                .drop("__rn")
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            time.sleep(0.05)
    finally:
        cached.unpersist()
    return src


def test_stream_funnel_watermark_bounds_candidate_state(
    spark, ordered_events_src, tmp_path_factory
):
    """Same final chains with and without a watermark (ordered slices
    carry no actually-late data, so a 1h delay drops nothing), but
    the pruned run must retain strictly less candidate state — the
    bound that makes the operator viable on an unbounded stream."""
    def run(name, delay):
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(ordered_events_src)
        )
        out = _drain_update(
            spark,
            funnel_stream(stream, STEPS, watermark_delay=delay),
            name,
            tmp_path_factory,
        )
        final = _final_rows(out)
        total_cands = final.agg(F.sum("n_candidates")).collect()[0][0]
        return _chains(final), total_cands

    chains_wm, cands_wm = run("funnel_wm", "1 hour")
    chains_raw, cands_raw = run("funnel_nowm", None)
    assert chains_wm == chains_raw
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(ordered_events_src)
    want = _chains(funnel_user_steps(ev, STEPS))
    assert chains_wm == want
    assert cands_wm < cands_raw, (cands_wm, cands_raw)


def test_stream_funnel_validation(spark):
    df = spark.createDataFrame([], EVENTS_SCHEMA)
    with pytest.raises(ValueError):
        funnel_stream(df, [])
    with pytest.raises(ValueError):
        funnel_stream(df, ["view", "view"])
