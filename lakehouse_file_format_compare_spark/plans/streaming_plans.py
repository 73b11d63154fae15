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


def _sdrift_agg(events: DataFrame) -> DataFrame:
    """r9 widening: the streaming drift monitor
    (operators/divergence.py::windowed_psi_vs_baseline — per 10-minute
    event-time window, PSI of ``value`` against the full-table
    baseline) reduced to exact integer scalars. psi_nanos are LONG
    fixed-point partials, so the window count, the total, and the
    rank-weighted fingerprint are all partition-layout-proof values
    the oracle replays from scratch. The ordering window ranks the
    PER-WINDOW aggregate (one row per event-time window), not events.
    """
    from pyspark.sql import Window

    from ..operators.divergence import windowed_psi_vs_baseline

    psi = windowed_psi_vs_baseline(events, events)
    w = Window.orderBy(F.col("psi_nanos").desc(), F.col("window_start"))
    return psi.withColumn("__rn", F.row_number().over(w)).agg(
        F.count(F.lit(1)).cast("long").alias("sdrift_windows"),
        F.sum("psi_nanos").cast("long").alias("sdrift_psi_nanos_total"),
        F.sum(F.col("__rn") * F.col("psi_nanos")).cast("long").alias(
            "sdrift_fp"
        ),
        F.max(F.when(F.col("__rn") == 1, F.col("psi_nanos"))).cast(
            "long"
        ).alias("sdrift_top_psi_nanos"),
    )


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event_type:
    count + volume. Streaming-ready: add withWatermark("ts", ...) and
    this plan runs unchanged under readStream. Widened in r9 with the
    streaming drift monitor scalars (sdrift_*, see _sdrift_agg)."""
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
        .crossJoin(F.broadcast(_sdrift_agg(events)))
    )


SDRIFT_BINS = 8  # operators/divergence.PSI_BINS
SDRIFT_ALPHA = 0.5  # operators/divergence.PSI_ALPHA

TUMBLING_WINDOW_SQL = f"""
WITH sd_b AS (
    SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
    WHERE value IS NOT NULL
), sd_bounds AS (
    SELECT MIN(v) AS mn, MAX(v) AS mx FROM sd_b
), sd_bh0 AS (
    SELECT ((v - mn) * {SDRIFT_BINS}) // (mx - mn + 1) AS bin,
           CAST(COUNT(*) AS BIGINT) AS cb
    FROM sd_b CROSS JOIN sd_bounds GROUP BY 1
), sd_bh AS (
    SELECT g.bin, COALESCE(sd_bh0.cb, 0) AS cb
    FROM (SELECT unnest(generate_series(0, {SDRIFT_BINS - 1})) AS bin) g
    LEFT JOIN sd_bh0 USING (bin)
), sd_tot AS (
    SELECT CAST(SUM(cb) AS BIGINT) AS nn FROM sd_bh0
), sd_wc AS (
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS ws,
           LEAST(GREATEST(((CAST(floor(value * 100 + 0.5) AS BIGINT) - mn) * {SDRIFT_BINS}) // (mx - mn + 1), 0), {SDRIFT_BINS - 1}) AS bin,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events CROSS JOIN sd_bounds WHERE value IS NOT NULL GROUP BY 1, 2
), sd_wins AS (
    SELECT ws, CAST(SUM(c) AS BIGINT) AS n FROM sd_wc GROUP BY 1
), sd_dense AS (
    SELECT w.ws, w.n, g.bin, COALESCE(sd_wc.c, 0) AS c
    FROM sd_wins w
    CROSS JOIN (SELECT unnest(generate_series(0, {SDRIFT_BINS - 1})) AS bin) g
    LEFT JOIN sd_wc ON sd_wc.ws = w.ws AND sd_wc.bin = g.bin
), sd_t AS (
    SELECT ws,
           (c + {SDRIFT_ALPHA}) / (n + {SDRIFT_ALPHA} * {SDRIFT_BINS}) AS p,
           (cb + {SDRIFT_ALPHA}) / (sd_tot.nn + {SDRIFT_ALPHA} * {SDRIFT_BINS}) AS q
    FROM sd_dense JOIN sd_bh USING (bin) CROSS JOIN sd_tot
), sd_agg AS (
    SELECT ws,
           CAST(SUM(CAST(floor(((p - q) * ln(p / q)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS psi_nanos
    FROM sd_t GROUP BY 1
), sd AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS sdrift_windows,
           CAST(SUM(psi_nanos) AS BIGINT) AS sdrift_psi_nanos_total,
           CAST(SUM(rn * psi_nanos) AS BIGINT) AS sdrift_fp,
           CAST(MAX(CASE WHEN rn = 1 THEN psi_nanos END) AS BIGINT) AS sdrift_top_psi_nanos
    FROM (SELECT *, row_number() OVER (ORDER BY psi_nanos DESC, ws) AS rn
          FROM sd_agg)
)
SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
       time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS volume,
       sdrift_windows, sdrift_psi_nanos_total, sdrift_fp,
       sdrift_top_psi_nanos
FROM events, sd
GROUP BY 1, 2, 3, sdrift_windows, sdrift_psi_nanos_total, sdrift_fp,
         sdrift_top_psi_nanos
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


SHH_K = 5
SHH_FP_MOD = 1_000_003


def _shh_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitters made driver-visible (r9, r8 verdict
    #8): drain streaming/topk_stream.py over the events table as ONE
    AvailableNow micro-batch and reduce the final per-group summary to
    exact scalars. On a single batch the Misra-Gries summary IS the
    exact per-group top-k with bound = the rank-(k+1) count
    (equivalence pinned in tests/test_streaming_topk.py), so a DuckDB
    oracle replays every value: a fingerprint over (item, rank,
    lower_bound) across all groups, the summed bounds, and total rows.
    The drain is a REAL applyInPandasWithState streaming query —
    memory sink, availableNow trigger — executed eagerly; the scalars
    come back as a 1-row literal frame (the widening crossJoin shape
    of corpus_build_summary)."""
    import os
    import shutil
    import tempfile
    import uuid

    from ..streaming.stateful import drain_available_now
    from ..streaming.topk_stream import topk_stream

    name = f"shh_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="shh_ckpt_")
    src = tempfile.mkdtemp(prefix="shh_src_")
    try:
        # the file stream source requires a DIRECTORY; stage the
        # single-file table behind a symlink (copy if the fs refuses)
        target = os.path.join(src, "events.parquet")
        try:
            os.symlink(os.path.join(sf_dir, "events.parquet"), target)
        except OSError:
            shutil.copy(os.path.join(sf_dir, "events.parquet"), target)
        stream = spark.readStream.schema(
            "user_id long, event_type string"
        ).parquet(src)
        q = (
            topk_stream(stream, SHH_K)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        drain_available_now(q)
        from pyspark.sql import Window

        w = Window.partitionBy("grp")
        final = (
            spark.table(name)
            .withColumn("__m", F.max("emit_seq").over(w))
            .where(F.col("emit_seq") == F.col("__m"))
        )
        row = final.agg(
            F.countDistinct("grp").cast("long").alias("shh_groups"),
            F.sum(
                F.pmod(F.col("item").cast("long"), F.lit(SHH_FP_MOD))
                * F.col("rank")
                + F.col("lower_bound")
            ).cast("long").alias("shh_fp"),
            # bound_total / n_rows repeat per rank row: sum one per grp
            F.sum(
                F.when(F.col("rank") == 1, F.col("bound_total"))
            ).cast("long").alias("shh_bound_total"),
            F.sum(
                F.when(F.col("rank") == 1, F.col("n_rows"))
            ).cast("long").alias("shh_rows_total"),
        ).first()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(
            [(int(row["shh_groups"]), int(row["shh_fp"]),
              int(row["shh_bound_total"]), int(row["shh_rows_total"]))],
            "shh_groups long, shh_fp long, shh_bound_total long, shh_rows_total long",
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)


def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup (operators/rollup.py) — the
    batch view of the continuous aggregate; incremental maintenance
    is tested in tests/test_rollup.py. Widened in r9 with the
    streaming heavy-hitters scalars (shh_*, see _shh_agg) so the
    applyInPandasWithState top-k family is driver-checked."""
    from ..operators.rollup import time_rollup

    rolled = time_rollup(table(spark, sf_dir, "events"), bucket="1 hour")
    return rolled.crossJoin(F.broadcast(_shh_agg(spark, sf_dir)))


HOURLY_ROLLUP_SQL = f"""
WITH shh_counts AS (
    SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item,
           COUNT(*) AS cnt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY COUNT(*) DESC,
                                       CAST(user_id AS VARCHAR)) AS rn
    FROM events GROUP BY 1, 2
), shh_bounds AS (
    SELECT grp,
           COALESCE(MAX(CASE WHEN rn = {SHH_K + 1} THEN cnt END), 0) AS bound,
           SUM(cnt) AS n_rows
    FROM shh_counts GROUP BY 1
), shh AS (
    SELECT (SELECT COUNT(DISTINCT grp) FROM shh_counts) AS shh_groups,
           (SELECT CAST(SUM(CAST(item AS BIGINT) % {SHH_FP_MOD} * rn + cnt) AS BIGINT)
            FROM shh_counts WHERE rn <= {SHH_K}) AS shh_fp,
           CAST(SUM(bound) AS BIGINT) AS shh_bound_total,
           CAST(SUM(n_rows) AS BIGINT) AS shh_rows_total
    FROM shh_bounds
)
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {grid_sql(f"SUM({grid_sql('value', 2)})", 2)} AS value_sum,
       MIN({grid_sql('value', 2)}) AS value_min,
       MAX({grid_sql('value', 2)}) AS value_max,
       shh_groups, shh_fp, shh_bound_total, shh_rows_total
FROM events, shh
GROUP BY 1, 2, shh_groups, shh_fp, shh_bound_total, shh_rows_total
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
