"""Event-time windowed aggregations over the events stream table.

The reference emulates streaming with cron micro-batches (SURVEY
§2.9); these plans add the real event-time window surface. Each is a
batch-executable DataFrame plan that is also valid under
``readStream`` + ``withWatermark`` (same expressions — tested in
tests/test_streaming.py), which is the point: one query definition,
two runners.

Tumbling and hopping windows have exact DuckDB oracles (time_bucket /
explicit window arithmetic). Session windows (F.session_window) are
gap-based and not reasonably SQL-expressible → rows-only check +
unit-tested semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..sources.testdata import table


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event_type:
    count + volume. Streaming-ready: add withWatermark("ts", ...) and
    this plan runs unchanged under readStream."""
    events = table(spark, sf_dir, "events")
    v = grid(F.col("value"), 2)
    return (
        events.groupBy(
            F.window("ts", "10 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            grid(F.sum(v), 2).alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "volume",
        )
    )


TUMBLING_WINDOW_SQL = f"""
SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
       time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS volume
FROM events
GROUP BY 1, 2, 3
"""


def hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 15 minutes (each event lands in
    2 windows). Oracle replicates the hop via explicit 2-window
    generation."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


HOPPING_WINDOW_SQL = """
WITH hops AS (
    SELECT ts, unnest([
        make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000),
        make_timestamp(CAST((floor(epoch(ts) / 900) - 1) * 900 AS BIGINT) * 1000000)
    ]) AS window_start
    FROM events
)
SELECT window_start, COUNT(*) AS n_events
FROM hops
WHERE ts >= window_start AND ts < window_start + INTERVAL 30 MINUTE
GROUP BY 1
"""


def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap —
    F.session_window, the stateful-streaming-native operator. Oracle:
    gap-flag + cumulative-sum sessionization, with Spark's
    end-extension semantics (session end = last event + gap)."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "5 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 300 THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 5 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup (operators/rollup.py) — the
    batch view of the continuous aggregate; incremental maintenance
    is tested in tests/test_rollup.py."""
    from ..operators.rollup import time_rollup

    return time_rollup(table(spark, sf_dir, "events"), bucket="1 hour")


HOURLY_ROLLUP_SQL = f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS value_sum,
       MIN({grid_sql('value', 2)}) AS value_min,
       MAX({grid_sql('value', 2)}) AS value_max
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "stream_tumbling_window": tumbling_window,
    "stream_hopping_window": hopping_window,
    "stream_session_window": session_window,
    "stream_hourly_rollup": hourly_rollup,
}

ORACLES = {
    "stream_tumbling_window": TUMBLING_WINDOW_SQL,
    "stream_hopping_window": HOPPING_WINDOW_SQL,
    "stream_session_window": SESSION_WINDOW_SQL,
    "stream_hourly_rollup": HOURLY_ROLLUP_SQL,
}
