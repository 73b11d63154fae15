"""Mergeable-sketch rollups — the 100 TB distinct-counting pattern.

``COUNT(DISTINCT x)`` does not decompose: a monthly distinct cannot
be summed from daily distincts, so naive pipelines re-scan the fact
table once per rollup grain. Mergeable sketches fix this: scan ONCE
at the finest grain into partial HLL sketches (Spark 4 ships Apache
DataSketches HLL as ``hll_sketch_agg``), then every coarser grain is
a cheap ``hll_union_agg`` over the tiny pre-aggregated rows — the
same partial/final shape as a SUM rollup.

Estimate-equality caveat (measured in r7, not just theorized): in the
sparse (coupon-exact) regime the merged estimate EQUALS what a direct
coarse-grain scan gives — asserted on the events corpus in
tests/test_sketches.py. Past the sparse threshold the registers still
union losslessly but the ESTIMATOR path differs (a never-unioned
sketch uses DataSketches' HIP estimator, any union result the
composite estimator, and HLL_4 promotion points vary with the partial
grain), so different union paths give slightly different numbers: on
sf0.01 orders (~1450 distinct, lg_k=12), coarse-direct 1456 vs
(status,month)-merged 1441 vs 37-hash-bucket-merged 1459. The
portable contracts — pinned in tests and in the op_approx_distinct
driver row — are: estimates within the error envelope of exact
DuckDB distincts, exact conservation of the riding row counts, and
invariance of the merged estimate to physical order/partitioning of
the same partial set.

The reference has no sketch surface (its only distinct is
COUNT(DISTINCT) inside gold queries, dags/3_silver_to_gold.py); this
is extension surface for the training-data-pipeline family (e.g.
distinct documents per source per day, rolled up to month/source
without re-scanning the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partial_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Finest-grain partial aggregation: one binary HLL sketch of
    ``value_col`` per group (plus the exact per-group row count for
    free). This is the table you PERSIST — every future rollup reads
    it instead of the fact table."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("hll_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    rollup_cols: list[str],
) -> DataFrame:
    """Merge partial sketches to a coarser grain: distinct-count
    estimates via ``hll_union_agg`` — no fact-table access, cost ∝
    number of fine-grain groups."""
    return sketches.groupBy(*rollup_cols).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll_sketch))").alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )


def distinct_rollup_report(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One-scan two-grain distinct report: fine-grain estimates and
    coarse-grain estimates from the SAME partial sketches. Returns the
    coarse frame (coarse_cols, distinct_est, n_rows)."""
    return hll_rollup(
        hll_partial_sketches(df, fine_cols, value_col, lg_k), coarse_cols
    )
