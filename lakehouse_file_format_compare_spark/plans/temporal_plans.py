"""As-of and range join queries (operators/temporal.py) — the
custom-operator ladder's composition strategy, oracle-checked against
DuckDB's native ASOF JOIN / theta join.

``op_asof_join``: attribution — each purchase event picks up the most
recent prior 'view' event of the same user.
``op_range_join``: events bucketed into literal value tiers via the
bin-and-refine range join.
``events_analytics_suite`` (r7): the behavioral-analytics trio over
the events table (operators/funnel.py) — funnel conversion, cohort
retention and MAD outlier detection — folded into tagged metric rows
with a full DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..operators.funnel import (
    MAD_SIGMA,
    attribution_all_models,
    burst_stats,
    funnel_counts,
    mad_outliers,
    retention_matrix,
)
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


# events_analytics_suite constants. The funnel is the natural
# signup → view → purchase ordering with a 7-day completion span;
# retention cohorts are 7-day periods from the testdata's origin; the
# anomaly injection (event_id % ANOM_MOD -> value * ANOM_FACTOR) makes
# the MAD outlier count non-vacuous on the synthetic uniform values
# (whose natural MAD envelope contains the whole range) — the
# hygiene-suite injection precedent, replayed verbatim in the oracle.
FUNNEL_STEPS = ["signup", "view", "purchase"]
FUNNEL_SPAN_S = 7 * 86400
RET_ORIGIN = "2024-01-01"
RET_PERIOD_S = 7 * 86400
ANOM_MOD = 500
ANOM_FACTOR = 20.0
ANOM_Z = 3.0
# burst detection: trailing 6h per-(user, type) activity — the
# time-RANGE window frame mode (integer epoch-us range bounds, exact
# on both engines)
BURST_WINDOW_S = 6 * 3600
# linear multi-touch attribution: purchase value split across the
# user's view/click touches in the 3 days before the purchase
ATTR_TOUCHES = ["view", "click"]
ATTR_LOOKBACK_S = 3 * 86400


def events_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged metric rows (family, item, n, v) for the three
    behavioral-analytics operators. All values deterministic: counts
    exact, rates grid-4, MADs grid-6 (snapped at the interpolation
    site, operators/funnel.py::mad_outliers)."""
    ev = table(spark, sf_dir, "events")

    fr = funnel_counts(
        ev, FUNNEL_STEPS, max_span_seconds=FUNNEL_SPAN_S
    ).select(
        F.lit("funnel").alias("family"),
        F.concat(
            F.col("step_index").cast("string"), F.lit(":"), F.col("step_name")
        ).alias("item"),
        F.col("users").alias("n"),
        F.col("conversion").alias("v"),
    )

    rr = retention_matrix(
        ev, origin=RET_ORIGIN, period_seconds=RET_PERIOD_S
    ).select(
        F.lit("retention").alias("family"),
        F.concat(
            F.lit("c"), F.col("cohort").cast("string"),
            F.lit(":o"), F.col("offset").cast("string"),
        ).alias("item"),
        F.col("retained").alias("n"),
        F.col("retention_rate").alias("v"),
    )

    aug = ev.select(
        "event_type",
        (
            F.col("value")
            * F.when(
                F.pmod(F.col("event_id"), F.lit(ANOM_MOD)) == 0,
                F.lit(ANOM_FACTOR),
            ).otherwise(F.lit(1.0))
        ).alias("value"),
    )
    ar = mad_outliers(aug, "event_type", "value", z=ANOM_Z).select(
        F.lit("anomaly").alias("family"),
        F.col("event_type").alias("item"),
        F.col("n_outliers").alias("n"),
        F.col("mad").alias("v"),
    )

    br = burst_stats(ev, window_seconds=BURST_WINDOW_S).select(
        F.lit("burst").alias("family"),
        F.col("event_type").alias("item"),
        F.col("max_trailing").alias("n"),
        F.col("avg_trailing").alias("v"),
    )

    # all three attribution models from ONE conversions x touches join
    # (operators/funnel.py::attribution_all_models; the per-model
    # operators are equality-pinned against it in tests/test_funnel.py)
    at = attribution_all_models(
        ev,
        touch_types=ATTR_TOUCHES,
        conversion_type="purchase",
        lookback_seconds=ATTR_LOOKBACK_S,
    ).select(
        F.when(F.col("model") == "linear", F.lit("attribution"))
        .otherwise(F.concat(F.lit("attribution_"), F.col("model")))
        .alias("family"),
        F.col("touch_type").alias("item"),
        F.col("touches").alias("n"),
        F.col("credited_value").alias("v"),
    )

    return (
        fr.unionByName(rr).unionByName(ar).unionByName(br).unionByName(at)
    )


_PERIOD_US = RET_PERIOD_S * 1_000_000

EVENTS_ANALYTICS_SUITE_SQL = f"""
WITH f1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
), f2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN f1 USING (user_id)
    WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > f1.t1
      AND e.ts <= f1.t1 + INTERVAL {FUNNEL_SPAN_S} SECOND
    GROUP BY e.user_id
), f3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN f2 USING (user_id) JOIN f1 USING (user_id)
    WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > f2.t2
      AND e.ts <= f1.t1 + INTERVAL {FUNNEL_SPAN_S} SECOND
    GROUP BY e.user_id
), fc AS (
    SELECT (SELECT COUNT(*) FROM f1) AS n1,
           (SELECT COUNT(*) FROM f2) AS n2,
           (SELECT COUNT(*) FROM f3) AS n3
), funnel_rows AS (
    SELECT 'funnel' AS family, '1:{FUNNEL_STEPS[0]}' AS item, n1 AS n,
           CASE WHEN n1 > 0 THEN {grid_sql('n1 / CAST(n1 AS DOUBLE)', 4)} ELSE 0.0 END AS v
    FROM fc
    UNION ALL
    SELECT 'funnel', '2:{FUNNEL_STEPS[1]}', n2,
           CASE WHEN n1 > 0 THEN {grid_sql('n2 / CAST(n1 AS DOUBLE)', 4)} ELSE 0.0 END
    FROM fc
    UNION ALL
    SELECT 'funnel', '3:{FUNNEL_STEPS[2]}', n3,
           CASE WHEN n1 > 0 THEN {grid_sql('n3 / CAST(n1 AS DOUBLE)', 4)} ELSE 0.0 END
    FROM fc
), rf AS (
    SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
), rc AS (
    SELECT user_id,
           CAST(floor((epoch_us(first_ts) - epoch_us(TIMESTAMP '{RET_ORIGIN}')) / {_PERIOD_US}) AS BIGINT) AS cohort
    FROM rf
), rcell AS (
    SELECT e.user_id, c.cohort,
           CAST(floor((epoch_us(e.ts) - epoch_us(TIMESTAMP '{RET_ORIGIN}')) / {_PERIOD_US}) AS BIGINT) - c.cohort AS off
    FROM events e JOIN rc c USING (user_id)
), rmat AS (
    SELECT cohort, off, COUNT(DISTINCT user_id) AS retained
    FROM rcell GROUP BY cohort, off
), rsize AS (
    SELECT cohort, retained AS csize FROM rmat WHERE off = 0
), ret_rows AS (
    SELECT 'retention' AS family,
           'c' || CAST(m.cohort AS VARCHAR) || ':o' || CAST(m.off AS VARCHAR) AS item,
           m.retained AS n,
           {grid_sql('m.retained / CAST(s.csize AS DOUBLE)', 4)} AS v
    FROM rmat m JOIN rsize s USING (cohort)
), aug AS (
    SELECT event_type,
           value * (CASE WHEN event_id % {ANOM_MOD} = 0 THEN {ANOM_FACTOR} ELSE 1.0 END) AS v
    FROM events
), amed AS (
    SELECT event_type, {grid_sql('quantile_cont(v, 0.5)', 6)} AS med
    FROM aug GROUP BY event_type
), adev AS (
    SELECT a.event_type, abs(a.v - m.med) AS dev
    FROM aug a JOIN amed m USING (event_type)
), amad AS (
    SELECT event_type, {grid_sql('quantile_cont(dev, 0.5)', 6)} AS mad
    FROM adev GROUP BY event_type
), anom_rows AS (
    SELECT 'anomaly' AS family, d.event_type AS item,
           SUM(CASE WHEN {grid_sql('dev', 6)} > {grid_sql(f'{ANOM_Z} * {MAD_SIGMA} * mad', 6)}
                    THEN 1 ELSE 0 END) AS n,
           mad AS v
    FROM adev d JOIN amad USING (event_type)
    GROUP BY d.event_type, mad
), btc AS (
    SELECT event_type,
           COUNT(*) OVER (PARTITION BY user_id, event_type
                          ORDER BY epoch_us(ts)
                          RANGE BETWEEN {BURST_WINDOW_S * 1_000_000} PRECEDING
                                    AND CURRENT ROW) AS tc
    FROM events
), burst_rows AS (
    SELECT 'burst' AS family, event_type AS item,
           MAX(tc) AS n,
           {grid_sql('SUM(tc) / CAST(COUNT(*) AS DOUBLE)', 4)} AS v
    FROM btc GROUP BY event_type
), at_conv AS (
    SELECT user_id AS u, event_id AS conv_id, epoch_us(ts) AS conv_us,
           {grid_sql('value', 2)} AS val
    FROM events WHERE event_type = 'purchase'
), at_touch AS (
    SELECT user_id AS u, event_type AS touch_type, epoch_us(ts) AS touch_us
    FROM events WHERE event_type IN ({", ".join(f"'{t}'" for t in ATTR_TOUCHES)})
), at_j AS (
    SELECT c.conv_id, c.val, t.touch_type, t.touch_us
    FROM at_conv c JOIN at_touch t ON c.u = t.u
    WHERE t.touch_us < c.conv_us
      AND t.touch_us >= c.conv_us - {ATTR_LOOKBACK_S * 1_000_000}
), at_n AS (
    SELECT conv_id, COUNT(*) AS nt FROM at_j GROUP BY conv_id
), at_rows AS (
    SELECT 'attribution' AS family, j.touch_type AS item,
           COUNT(*) AS n,
           {grid_sql("SUM(" + grid_sql("j.val / nt", 6) + ")", 2)} AS v
    FROM at_j j JOIN at_n USING (conv_id)
    GROUP BY j.touch_type
    UNION ALL
    SELECT 'attribution', '__unattributed',
           COUNT(*),
           {grid_sql("COALESCE(SUM(val), 0)", 2)}
    FROM at_conv WHERE conv_id NOT IN (SELECT conv_id FROM at_j)
), at_ranked AS (
    SELECT conv_id, val, touch_type,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_us, touch_type) AS rf,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY touch_us DESC, touch_type DESC) AS rl
    FROM at_j
), at_pos_rows AS (
    SELECT 'attribution_first' AS family, touch_type AS item,
           COUNT(*) AS n, {grid_sql("SUM(" + grid_sql("val", 2) + ")", 2)} AS v
    FROM at_ranked WHERE rf = 1 GROUP BY touch_type
    UNION ALL
    SELECT 'attribution_last', touch_type,
           COUNT(*), {grid_sql("SUM(" + grid_sql("val", 2) + ")", 2)}
    FROM at_ranked WHERE rl = 1 GROUP BY touch_type
    UNION ALL
    -- per-model __unattributed rows (r8): the fused operator emits
    -- one per model; numbers are identical across models by design
    SELECT 'attribution_first', '__unattributed', COUNT(*),
           {grid_sql("COALESCE(SUM(val), 0)", 2)}
    FROM at_conv WHERE conv_id NOT IN (SELECT conv_id FROM at_j)
    UNION ALL
    SELECT 'attribution_last', '__unattributed', COUNT(*),
           {grid_sql("COALESCE(SUM(val), 0)", 2)}
    FROM at_conv WHERE conv_id NOT IN (SELECT conv_id FROM at_j)
)
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM funnel_rows
UNION ALL
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM ret_rows
UNION ALL
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM anom_rows
UNION ALL
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM burst_rows
UNION ALL
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM at_rows
UNION ALL
SELECT family, item, CAST(n AS BIGINT) AS n, v FROM at_pos_rows
"""


QUERIES = {
    "op_asof_join": asof_view_attribution,
    "op_range_join": range_join_tiers,
    "op_sessionization": sessionization_stats,
    "events_analytics_suite": events_analytics_suite,
}

ORACLES = {
    "op_asof_join": ASOF_VIEW_ATTRIBUTION_SQL,
    "op_range_join": RANGE_JOIN_TIERS_SQL,
    "op_sessionization": SESSIONIZATION_STATS_SQL,
    "events_analytics_suite": EVENTS_ANALYTICS_SUITE_SQL,
}
