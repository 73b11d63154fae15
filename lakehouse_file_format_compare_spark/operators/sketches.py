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


def topk_partial_summaries(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 8,
) -> DataFrame:
    """Mergeable heavy-hitter partials — the frequent-items companion
    to the HLL rollup above (Misra-Gries / SpaceSaving family, public
    textbook algorithms). Per fine-grain group, keep the ``k`` most
    frequent values with EXACT counts (ties break on the smaller
    value, so the summary is deterministic and engine-replayable) plus
    the group's error bound: the count at rank k+1 — any value absent
    from the summary has true in-group count <= that bound.

    One fact scan: a (group, value) count (partial aggregation
    map-side) and a per-group window limited to the top ranks.
    Returns one PERSISTABLE row per group:
    (group_cols…, items: array<struct<rank,item,cnt>>, bound, n_rows)
    — n_rows counts ALL rows, kept or not, so rollups can verify
    conservation exactly."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__cnt").desc(), F.col(value_col).asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("__rn") <= k,
                    F.struct(
                        F.col("__rn").alias("rank"),
                        F.col(value_col).alias("item"),
                        F.col("__cnt").alias("cnt"),
                    ),
                )
            )
        ).alias("items"),
        F.coalesce(
            F.max(F.when(F.col("__rn") > k, F.col("__cnt"))), F.lit(0)
        ).cast("long").alias("bound"),
        F.sum("__cnt").cast("long").alias("n_rows"),
    )


def topk_rollup(
    partials: DataFrame,
    rollup_cols: list[str],
    k: int = 8,
) -> DataFrame:
    """Merge partial top-k summaries to a coarser grain WITHOUT
    re-scanning the fact table: per merged value, the summed kept
    counts are a LOWER bound on its true coarse count; the summed
    per-group bounds cap what any dropped value could have hidden
    (true count <= lower bound + bound_total). The classic guarantee
    follows: every value whose true coarse count exceeds the summed
    bounds appears in the merged summary.

    Returns (rollup_cols…, rank, item, lower_bound, bound_total,
    n_rows) for the top ``k`` merged values — rank deterministic
    (lower bound desc, item asc)."""
    from pyspark.sql import Window

    exploded = partials.select(
        *rollup_cols, F.explode("items").alias("it")
    ).select(*rollup_cols, F.col("it.item").alias("item"), F.col("it.cnt").alias("cnt"))
    merged = exploded.groupBy(*rollup_cols, "item").agg(
        F.sum("cnt").cast("long").alias("lower_bound")
    )
    side = partials.groupBy(*rollup_cols).agg(
        F.sum("bound").cast("long").alias("bound_total"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    w = Window.partitionBy(*rollup_cols).orderBy(
        F.col("lower_bound").desc(), F.col("item").asc()
    )
    ranked = merged.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    joined = (
        ranked.crossJoin(F.broadcast(side))
        if not rollup_cols
        else ranked.join(side, list(rollup_cols))
    )
    return joined.select(
        *rollup_cols, "rank", "item", "lower_bound", "bound_total", "n_rows"
    )
