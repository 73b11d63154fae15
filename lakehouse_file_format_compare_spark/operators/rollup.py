"""Hypertable-style time rollup: continuous-aggregate maintenance
over an event stream (the TimescaleDB continuous-aggregate /
materialized-rollup pattern, Spark-native).

``time_rollup`` computes the bucketed aggregate table;
``fold_time_rollup`` maintains it incrementally from an append-only
delta — distributive aggregates only (count/sum/min/max; avg derived
at read time), so folding is exact and O(delta). Together with the
snapshot-versioned storage this gives a maintained, time-travelable
rollup table whose per-cycle cost is the new data, not the history
(same argument as pipeline/incremental_gold.py, generalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import grid

ROLLUP_AGGS = ("n_events", "value_sum", "value_min", "value_max")


def time_rollup(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    v = grid(F.col(value_col), 2)
    return (
        events.groupBy(F.window(ts_col, bucket).alias("w"), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            grid(F.sum(v), 2).alias("value_sum"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        )
        .select(F.col("w.start").alias("bucket_start"), *dims, *ROLLUP_AGGS)
    )


def fold_time_rollup(
    existing: DataFrame,
    delta_events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Fold an append-only event delta into an existing rollup:
    counts/sums add, min/max combine, only buckets present in the
    delta are touched (full-outer join on the bucket keys)."""
    delta = time_rollup(delta_events, bucket, ts_col, dims, value_col)
    keys = ["bucket_start", *dims]
    e = existing.alias("e")
    d = delta.alias("d")
    joined = e.join(d, on=keys, how="full_outer")
    return joined.select(
        *keys,
        (F.coalesce(F.col("e.n_events"), F.lit(0)) + F.coalesce(F.col("d.n_events"), F.lit(0))).alias("n_events"),
        grid(
            F.coalesce(F.col("e.value_sum"), F.lit(0.0)) + F.coalesce(F.col("d.value_sum"), F.lit(0.0)), 2
        ).alias("value_sum"),
        F.least(
            F.coalesce(F.col("e.value_min"), F.col("d.value_min")),
            F.coalesce(F.col("d.value_min"), F.col("e.value_min")),
        ).alias("value_min"),
        F.greatest(
            F.coalesce(F.col("e.value_max"), F.col("d.value_max")),
            F.coalesce(F.col("d.value_max"), F.col("e.value_max")),
        ).alias("value_max"),
    )
