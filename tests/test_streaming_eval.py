"""Streaming AUC monitor (streaming/eval_stream.py): draining scored
rows one micro-batch at a time must produce the BIT-IDENTICAL AUC of
the one-shot batch evaluation (per-score counts are additive), and
replaying the whole source is a no-op (insert-only merge keyed by
(batch_key, score))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.evaluation import (
    auc_report,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import StreamingAucMonitor
from tests.conftest import SF_SMOKE

CUTS = [(0, 170), (170, 340), (340, 500)]


@pytest.fixture(scope="module")
def scored(spark):
    """Deterministic scored/labeled rows derived from the documents
    table — heavy score ties across batches so the additive-merge
    path is genuinely exercised."""
    return (
        table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            (F.xxhash64("text") % 50).alias("score"),
            (F.col("lang") == "en").cast("int").alias("label"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def drained(spark, scored, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("eval_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            scored.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("score", "label")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    root = str(tmp_path_factory.mktemp("eval_wh"))
    ckpt = str(tmp_path_factory.mktemp("eval_ckpt"))
    monitor = StreamingAucMonitor(Warehouse(spark, root), ckpt)
    schema = spark.createDataFrame([], "score long, label int").schema
    monitor.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    return monitor, src, schema


def test_multiple_microbatches_ran(spark, drained):
    monitor, _, _ = drained
    keys = {r.batch_key for r in monitor.counts("docs").collect()}
    assert len(keys) >= 3  # maxFilesPerTrigger=1 over 3 files


def test_drain_equals_batch_auc(spark, scored, drained):
    monitor, _, _ = drained
    got = monitor.auc("docs").collect()[0]
    want = auc_report(scored).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.auc_den > 0  # non-degenerate fixture


def test_counts_are_exact_per_batch(spark, scored, drained):
    """Every (batch, score) cell equals the direct count of that
    slice — the store IS the grouped data, not an approximation."""
    monitor, _, _ = drained
    store = {
        (r.batch_key, r.s): (r.pos, r.neg)
        for r in monitor.counts("docs").collect()
    }
    total_pos = sum(p for p, _ in store.values())
    total_neg = sum(n for _, n in store.values())
    agg = scored.agg(
        F.sum("label").alias("p"), F.sum(1 - F.col("label")).alias("n")
    ).collect()[0]
    assert (total_pos, total_neg) == (agg.p, agg.n)


def test_replay_is_noop(spark, scored, drained, tmp_path_factory):
    monitor, src, schema = drained
    before = sorted(
        tuple(r) for r in monitor.counts("docs").collect()
    )
    ckpt2 = str(tmp_path_factory.mktemp("eval_ckpt2"))
    replay = StreamingAucMonitor(monitor.warehouse, ckpt2)
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    after = sorted(tuple(r) for r in replay.counts("docs").collect())
    assert before == after
    assert tuple(replay.auc("docs").collect()[0]) == tuple(
        auc_report(scored).collect()[0]
    )


def test_drain_full_eval_equals_batch(spark, scored, drained):
    """The drained count store serves the full fused evaluation
    (AUC + KS + threshold) bit-identical to the one-shot batch."""
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        full_eval_report,
    )

    monitor, _, _ = drained
    got = monitor.full_eval("docs").collect()[0]
    want = full_eval_report(scored).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.n_thresholds > 1


def test_drain_calibration_equals_batch(spark, scored, drained):
    """r11: the drained count store serves the isotonic calibration
    curve bit-identically to the one-shot batch fit on the raw
    rows (floor-exact minimax on additive counts)."""
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        isotonic_calibrate_bins,
    )

    monitor, _, _ = drained
    got = sorted(
        (r.bin_idx, r.bin_lo, r.n, r.pos, r.cal_nanos)
        for r in monitor.calibration("docs", n_bins=8).collect()
    )
    want = sorted(
        (r.bin_idx, r.bin_lo, r.n, r.pos, r.cal_nanos)
        for r in isotonic_calibrate_bins(scored, n_bins=8).collect()
    )
    assert got == want and len(got) > 1
    vals = [v for *_, v in got]
    assert vals == sorted(vals)


def test_calibrate_counts_equals_row_grain_apply(spark, scored, drained):
    """r12: the count-space serving half maps every distinct score to
    the SAME calibrated value as fitting + applying on the raw rows,
    and the count-weighted calibrated distribution matches."""
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        calibrate_counts,
        calibrate_scores,
    )

    monitor, _, _ = drained
    got = {
        r.cal_nanos: 0 for r in []
    }
    got = {}
    for r in calibrate_counts(monitor.counts("docs"), n_bins=8).collect():
        got[r.cal_nanos] = got.get(r.cal_nanos, 0) + r.n_rows
    want = {}
    for r in (
        calibrate_scores(scored, n_bins=8)
        .groupBy("cal_nanos")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        want[r.cal_nanos] = r.n
    assert got == want and len(got) > 1


def test_drain_calibrated_drift_equals_batch(spark, scored, drained):
    """r12 (r11 verdict #5): the monitor's per-batch calibrated-score
    drift equals the row-grain path — explode the store back to rows,
    map through the same curve, psi_nanos per batch. The production
    loop (score → calibrate → monitor) is exact end to end."""
    from lakehouse_file_format_compare_spark.operators.divergence import (
        psi_nanos,
    )
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        calibrate_counts,
    )

    monitor, _, _ = drained
    counts = monitor.counts("docs")
    got = sorted(
        tuple(r) for r in monitor.calibrated_drift("docs", n_bins=8).collect()
    )
    cal = calibrate_counts(counts, n_bins=8).select("s", "cal_nanos")
    rows = (
        counts.select("batch_key", "s", (F.col("pos") + F.col("neg")).alias("c"))
        .where(F.col("c") > 0)
        .select(
            "batch_key", "s",
            F.explode(F.expr("sequence(1, c)")).alias("__i"),
        )
        .join(cal, "s")
    )
    want = sorted(
        tuple(r)
        for r in psi_nanos(rows, "batch_key", "cal_nanos").collect()
    )
    assert got == want and len(got) >= 3  # one row per micro-batch
