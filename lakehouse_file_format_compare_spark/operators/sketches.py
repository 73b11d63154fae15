"""Mergeable-sketch rollups — the 100 TB distinct-counting pattern.

``COUNT(DISTINCT x)`` does not decompose: a monthly distinct cannot
be summed from daily distincts, so naive pipelines re-scan the fact
table once per rollup grain. Mergeable sketches fix this: scan ONCE
at the finest grain into partial HLL sketches (Spark 4 ships Apache
DataSketches HLL as ``hll_sketch_agg``), then every coarser grain is
a cheap ``hll_union_agg`` over the tiny pre-aggregated rows — the
same partial/final shape as a SUM rollup. Union of HLL sketches is
lossless w.r.t. the sketch state (register-wise max), so the merged
estimate EQUALS the estimate a direct coarse-grain scan would give —
asserted, not assumed, in tests/test_sketches.py, alongside a
relative-error contract against exact DuckDB distincts.

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
