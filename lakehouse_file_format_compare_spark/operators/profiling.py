"""Data profiling — the table-QA and skew-diagnosis operators a
large-scale pipeline runs before (and after) every expensive stage.

``profile_table``: per-column completeness/cardinality/range summary
in ONE pass over the table. The per-column aggregates are computed in
a single ``agg`` (map-side partials, one shuffle to one row) and then
unpivoted JVM-side with ``stack`` — never one scan per column, never
a driver loop. Exact ``countDistinct`` per column is the default (at
profile time you usually want truth); ``approx=True`` swaps in
HLL++ ``approx_count_distinct`` which removes the Expand the exact
multi-distinct plan needs — the 100 TB default.

``key_skew_report``: the distribution of per-key group sizes for a
prospective join/groupBy key — exactly the statistic that decides
between a plain and a salted plan (operators/skew.py,
sessionize_auto's dispatch). One groupBy(key) + one aggregate over
the counts table; heavy keys are reported with exact counts and a
deterministic fingerprint so engines can be compared.

Determinism: numeric min/max/mean and percentile outputs are
grid-snapped (functions/numeric.grid) so a DuckDB oracle replays
them bit-exactly; string/date extrema compare as strings.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no profiling surface (its DAGs assume clean seeded data);
extension surface in the dedup/sketches category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import grid

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row PER COLUMN: (column, n_rows, n_nulls, n_distinct,
    min_num, max_num, mean_num, min_str, max_str). Numeric extrema
    and mean are grid-2-snapped doubles (null for non-numerics);
    non-numeric extrema are strings cast AFTER the native min/max so
    ordering is the column type's, not lexicographic. One scan, one
    aggregate row, JVM-side stack unpivot."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        is_num = isinstance(fields[c], _NUMERIC)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("long").alias(f"__nulls_{i}")
        )
        aggs.append(
            (
                F.approx_count_distinct(c, rsd=0.02)
                if approx else F.countDistinct(c)
            ).cast("long").alias(f"__nd_{i}")
        )
        if is_num:
            aggs.append(grid(F.min(col).cast("double"), 2).alias(f"__mn_{i}"))
            aggs.append(grid(F.max(col).cast("double"), 2).alias(f"__mx_{i}"))
            aggs.append(grid(F.avg(col.cast("double")), 2).alias(f"__av_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__mns_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__mxs_{i}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mn_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__mx_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__av_{i}"))
            aggs.append(F.min(col).cast("string").alias(f"__mns_{i}"))
            aggs.append(F.max(col).cast("string").alias(f"__mxs_{i}"))

    one = df.agg(*aggs)
    # stack(n, 'col1', nulls_1, nd_1, ... ) -> one row per column
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            f"'{c}', __nulls_{i}, __nd_{i}, __mn_{i}, __mx_{i}, __av_{i},"
            f" __mns_{i}, __mxs_{i}"
        )
    stacked = one.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)})"
            " as (column, n_nulls, n_distinct, min_num, max_num,"
            " mean_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_nulls", "n_distinct",
        "min_num", "max_num", "mean_num", "min_str", "max_str",
    )


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 5,
    exact_percentiles: bool = True,
) -> DataFrame:
    """ONE summary row for the per-key group-size distribution of
    ``key_cols``: (n_rows, n_keys, max_count, avg_count, p50_count,
    p99_count, top1_key, top1_count, topk_fp, skew_ratio). The
    heavy-key fingerprint sums rank * count over the top_k keys under
    the deterministic (count desc, key asc) order; skew_ratio =
    max/avg is the salting dial (operators/skew.py: ratios ≫ 1 mean
    one task owns the key). Cost: one key shuffle + one aggregate
    over the (small) counts table. Exact ``percentile`` buffers the
    per-key counts in the aggregate — right for dashboard-scale key
    spaces and for oracle replay; at billions of DISTINCT keys pass
    ``exact_percentiles=False`` for the Greenwald-Khanna sketch
    (``percentile_approx``, bounded memory)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    counts = (
        df.select(key.alias("__key"))
        .groupBy("__key")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    from pyspark.sql import Window

    # heavy keys via sorted LIMIT (TakeOrderedAndProject: per-partition
    # partial top-k, no global sort, no single-partition window over
    # the counts table); the rank window then runs over <= top_k rows
    top_small = counts.orderBy(
        F.col("__cnt").desc(), F.col("__key").asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("__cnt").desc(), F.col("__key").asc())
    ranked = top_small.withColumn("__rn", F.row_number().over(w))
    top = ranked.agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__key"))).alias("top1_key"),
        F.max(F.when(F.col("__rn") == 1, F.col("__cnt"))).cast("long").alias(
            "top1_count"
        ),
        F.sum(F.col("__rn") * F.col("__cnt")).cast("long").alias("topk_fp"),
    )
    summary = counts.agg(
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__cnt").cast("long").alias("max_count"),
        grid(F.avg("__cnt"), 4).alias("avg_count"),
        grid(
            F.expr(
                "percentile(__cnt, 0.5)" if exact_percentiles
                else "percentile_approx(__cnt, 0.5, 10000)"
            ), 4,
        ).alias("p50_count"),
        grid(
            F.expr(
                "percentile(__cnt, 0.99)" if exact_percentiles
                else "percentile_approx(__cnt, 0.99, 10000)"
            ), 4,
        ).alias("p99_count"),
    )
    return (
        summary.crossJoin(F.broadcast(top))
        .withColumn(
            "skew_ratio",
            grid(F.col("max_count") / F.col("avg_count"), 4),
        )
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs_bp: tuple[int, ...] = (5000, 9500, 9900),
    bucket_shift: int = 44,
) -> DataFrame:
    """EXACT order statistics of a LONG column with no global sort and
    no approximation — the exact companion to the binned ``qh_*``
    histogram quantiles in operators/sketches.py (those are mergeable
    but bin-grained; this is value-grained and exact).

    ``probs_bp`` are basis points (5000 = the median). The quantile at
    p is the inverted-CDF value: the smallest v whose inclusive
    cumulative count reaches ``k = ceil(n * p)`` (exact integer:
    ``(n*bp + 9999) DIV 10000``) — the classic "lower" convention,
    deterministic cross-engine.

    Plan shape: one scan into per-VALUE-CLASS counts (map-side
    combined; the class table is bounded by the column's distinct
    values, not the row count), the operators/evaluation.py two-phase
    cumulative (range buckets by truncating DIV; only bucket totals
    cross a globally-ordered window), then one conditional-min
    aggregate per requested quantile. Returns ONE row:
    ``n, q{bp}...`` — all LONGs; empty input returns zeros.
    """
    from pyspark.sql import Window

    width = 1 << bucket_shift
    classes = (
        df.select(F.col(value_col).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("b", F.expr(f"v DIV {width}"))
    )
    w_buckets = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        classes.groupBy("b")
        .agg(F.sum("c").cast("long").alias("__bc"))
        .select(
            "b",
            F.coalesce(F.sum("__bc").over(w_buckets), F.lit(0)).alias("__off"),
        )
    )
    w_in = (
        Window.partitionBy("b").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = classes.join(F.broadcast(offsets), "b").select(
        "v",
        (F.col("__off") + F.sum("c").over(w_in)).alias("cum"),
    )
    tot = classes.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"))
    with_n = cum.crossJoin(F.broadcast(tot))
    return with_n.agg(
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n"),
        *[
            F.coalesce(
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"(n * {bp} + 9999) DIV 10000"),
                        F.col("v"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"q{bp}")
            for bp in probs_bp
        ],
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs_bp: tuple[int, ...] = (5000, 9500),
    bucket_shift: int = 44,
) -> DataFrame:
    """Per-group :func:`exact_quantiles` — one row per distinct group
    with ``n, q{bp}...``. Like the grouped AUC, BOTH cumulative
    windows are group-partitioned (within-bucket by ``(groups, b)``,
    bucket totals by ``groups``): no globally-ordered window anywhere,
    so per-group order statistics scale with groups x value-range,
    never through a single partition. The per-group profiling
    workhorse (per-source length percentiles, per-domain size
    distributions)."""
    from pyspark.sql import Window

    width = 1 << bucket_shift
    classes = (
        df.select(*group_cols, F.col(value_col).cast("long").alias("v"))
        .groupBy(*group_cols, "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("b", F.expr(f"v DIV {width}"))
    )
    w_buckets = (
        Window.partitionBy(*group_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        classes.groupBy(*group_cols, "b")
        .agg(F.sum("c").cast("long").alias("__bc"))
        .select(
            *group_cols,
            "b",
            F.coalesce(F.sum("__bc").over(w_buckets), F.lit(0)).alias("__off"),
        )
    )
    w_in = (
        Window.partitionBy(*group_cols, "b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = classes.join(offsets, [*group_cols, "b"]).select(
        *group_cols,
        "v",
        "c",
        (F.col("__off") + F.sum("c").over(w_in)).alias("cum"),
    )
    totals = cum.groupBy(*group_cols).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n")
    )
    return (
        cum.join(totals, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max("n").cast("long").alias("n"),
            *[
                F.coalesce(
                    F.min(
                        F.when(
                            F.col("cum")
                            >= F.expr(f"(n * {bp} + 9999) DIV 10000"),
                            F.col("v"),
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"q{bp}")
                for bp in probs_bp
            ],
        )
    )
