"""As-of and range join queries (operators/temporal.py) — the
custom-operator ladder's composition strategy, oracle-checked against
DuckDB's native ASOF JOIN / theta join.

``op_asof_join``: attribution — each purchase event picks up the most
recent prior 'view' event of the same user.
``op_range_join``: events bucketed into literal value tiers via the
bin-and-refine range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..operators.temporal import asof_join, range_join, session_stats
from ..sources.testdata import table

TIERS = [
    ("bronze", 0.0, 100.0),
    ("silver", 100.0, 200.0),
    ("gold", 200.0, 350.0),
    ("platinum", 350.0, 1000.0),
]


def asof_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["view_event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("view_event_id_asof").alias("attributed_view")
    )


ASOF_VIEW_ATTRIBUTION_SQL = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), views AS (
    SELECT event_id AS view_event_id, user_id, ts FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts, v.view_event_id AS attributed_view
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    intervals = spark.createDataFrame(TIERS, "tier string, lo double, hi double")
    joined = range_join(
        events.select("event_id", "value"), intervals,
        point_col="value", lo_col="lo", hi_col="hi", bucket_width=50.0,
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            grid(F.sum(grid(F.col("value"), 2)), 2).alias("volume"),
        )
    )


_TIER_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in TIERS)

RANGE_JOIN_TIERS_SQL = f"""
SELECT tier, COUNT(*) AS n_events,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS volume
FROM events
JOIN (VALUES {_TIER_VALUES}) AS tiers(tier, lo, hi)
  ON value >= lo AND value < hi
GROUP BY tier
"""


def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization over events
    (operators/temporal.py::sessionize, r5): per-session rollup with
    order-invariant value math (grid-2 snapped addends sum exactly in
    doubles, so Spark's partition order and DuckDB's scan order give
    the same bits)."""
    ev = table(spark, sf_dir, "events")
    return session_stats(
        ev, gap="30 minutes",
        value_agg=grid(F.sum(grid(F.col("value"), 2)), 2).alias("value_sum"),
    )


SESSIONIZATION_STATS_SQL = f"""
WITH ordered AS (
    SELECT event_id, user_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *, CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                   THEN 1 ELSE 0 END AS is_new
    FROM ordered
), sess AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(FLOOR(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT) AS duration_sec,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS value_sum
FROM sess GROUP BY user_id, session_seq
"""


QUERIES = {
    "op_asof_join": asof_view_attribution,
    "op_range_join": range_join_tiers,
    "op_sessionization": sessionization_stats,
}

ORACLES = {
    "op_asof_join": ASOF_VIEW_ATTRIBUTION_SQL,
    "op_range_join": RANGE_JOIN_TIERS_SQL,
    "op_sessionization": SESSIONIZATION_STATS_SQL,
}
