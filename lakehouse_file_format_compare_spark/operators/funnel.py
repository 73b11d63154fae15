"""Behavioral event analytics: funnel conversion, cohort retention
and robust (MAD) outlier detection — the classic product-analytics
trio over an append-only event stream, expressed as pure DataFrame
algebra so every number has an exact DuckDB replay.

Reference parity: the reference repo
(italovinicius18/lakehouse-file-format-compare) has no behavioral
analytics surface (its DAGs stop at fintech gold aggregates,
dags/3_silver_to_gold.py); this module is beyond-reference extension
surface in the same spirit as the sessionization / as-of-join family
(operators/temporal.py) — the event-table workloads a lakehouse
engine is actually pointed at.

Scale shapes (the 100 TB story):

- ``funnel_user_steps``: the per-user earliest ordered completion is
  a chain of conditional-min WINDOW expressions over ONE partitioning
  (the user key) — Catalyst plans a single Exchange + a stack of
  Window operators, and the closing per-user aggregate reuses the
  same partitioning, so a K-step funnel costs exactly one shuffle of
  the event table regardless of K (plan-pinned in
  tests/test_funnel.py). No joins, no per-step re-scans. Per-user
  event counts bound the window memory; for pathological hot users
  the sessionize_salted time-slice pattern applies unchanged.
- ``retention_matrix``: one user-grain aggregate (first activity) +
  one co-partitioned join back on the SAME key + one (cohort, offset)
  aggregate. Period arithmetic is pure integer math on epoch
  microseconds — no calendar functions, so Spark and DuckDB agree
  bit-exactly and partition pruning on a date-partitioned event table
  still applies upstream.
- ``mad_outliers``: per-key exact medians (two grouped ``percentile``
  passes) with the key-cardinality stat tables broadcast back. Exact
  medians are the right tool at dashboard-grain key cardinality
  (event types, tenants); for high-cardinality keys swap
  ``approx_percentile`` in — the surrounding algebra is unchanged
  (functions/stats.py pins the GK path's rank tolerance).

Cross-engine determinism: medians use linear interpolation on both
engines (Spark ``percentile`` == DuckDB ``quantile_cont``,
tests/test_stats.py), and every emitted double goes through the grid
snap (functions/numeric.py). Outlier comparisons snap BOTH sides to
the 1e-6 grid so the >-decision is engine-identical even on the
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import grid

# normal-consistency constant: MAD * 1.4826 estimates sigma for
# Gaussian data (public textbook value, e.g. Rousseeuw & Croux 1993)
MAD_SIGMA = 1.4826


def funnel_user_steps(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Earliest ordered funnel completion per user.

    A user reaches step i at the MIN event time t_i with
    ``type == steps[i]``, ``t_i > t_{i-1}`` (strictly after the
    previous step) and — when ``max_span_seconds`` is set —
    ``t_i <= t_1 + span`` (the whole funnel must complete within the
    span of its own first step). Returns one row per user seen in
    ``events``: (user, step1_ts .. stepK_ts), nulls from the first
    step the user never reached.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    ts = F.col(ts_col)
    df = events.select(user_col, ts_col, type_col)
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            # strictly after the previous step; NULL prev => never
            cond = cond & (ts > F.col(prev))
            if max_span_seconds is not None:
                cond = cond & (
                    ts <= F.col("step1_ts") + F.expr(f"INTERVAL {int(max_span_seconds)} SECOND")
                )
        df = df.withColumn(f"step{i}_ts", F.min(F.when(cond, ts)).over(w))
        prev = f"step{i}_ts"
    step_cols = [f"step{i}_ts" for i in range(1, len(steps) + 1)]
    # same partitioning as the windows — no second Exchange
    return df.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in step_cols]
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Step-level funnel summary: one row per step with the number of
    users reaching it and the conversion rate from step 1 (grid-4;
    0.0 when nobody enters the funnel)."""
    per_user = funnel_user_steps(
        events,
        steps,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        max_span_seconds=max_span_seconds,
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"step{i}_ts")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # unpivot the single counts row into per-step rows
    pairs = []
    for i, step in enumerate(steps, start=1):
        pairs.append(
            F.struct(
                F.lit(i).alias("step_index"),
                F.lit(step).alias("step_name"),
                F.col(f"n{i}").cast("long").alias("users"),
            )
        )
    rows = counts.select(
        F.explode(F.array(*pairs)).alias("s"), F.col("n1").alias("__n1")
    )
    return rows.select(
        F.col("s.step_index").alias("step_index"),
        F.col("s.step_name").alias("step_name"),
        F.col("s.users").alias("users"),
        F.when(
            F.col("__n1") > 0,
            grid(F.col("s.users") / F.col("__n1"), 4),
        ).otherwise(F.lit(0.0)).alias("conversion"),
    )


def retention_matrix(
    events: DataFrame,
    *,
    origin: str,
    period_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: cohort = the period (indexed from ``origin``)
    of a user's FIRST event; for each (cohort, offset) the number of
    distinct cohort users active ``offset`` periods later, plus the
    retention rate relative to the cohort size (= the offset-0 count:
    every user's first event lands in their own cohort period).

    Pure integer epoch-microsecond arithmetic — engine-portable, no
    calendar functions.
    """
    period_us = int(period_seconds) * 1_000_000
    origin_us = F.unix_micros(F.lit(origin).cast("timestamp"))
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohorts = first.select(
        user_col,
        F.floor((F.unix_micros(F.col("__first_ts")) - origin_us) / period_us)
        .cast("long")
        .alias("cohort"),
    )
    joined = events.select(user_col, ts_col).join(cohorts, user_col)
    cells = joined.select(
        user_col,
        "cohort",
        (
            F.floor((F.unix_micros(F.col(ts_col)) - origin_us) / period_us).cast("long")
            - F.col("cohort")
        ).alias("offset"),
    )
    matrix = cells.groupBy("cohort", "offset").agg(
        F.countDistinct(user_col).alias("retained")
    )
    size = matrix.where(F.col("offset") == 0).select(
        "cohort", F.col("retained").alias("__cohort_size")
    )
    return matrix.join(size, "cohort").select(
        "cohort",
        "offset",
        "retained",
        grid(F.col("retained") / F.col("__cohort_size"), 4).alias("retention_rate"),
    )


def _windowed_pairs(
    conv: DataFrame, touch: DataFrame, lb_us: int, slice_join: bool
) -> DataFrame:
    """conversions ⋈ touches restricted to the strict lookback window
    ``[conv - lookback, conv)`` — the shared join of all three
    attribution models.

    Default (``slice_join=False``): equi-join on the user key with
    the time predicate as a join filter. The sort-merge join emits
    ALL C_u × T_u pairs for a user before filtering, so a hot user
    with many in-corpus conversions is quadratic in their activity —
    fine under normal skew, the wrong shape for a whale user at
    100 TB (r7 verdict #8).

    ``slice_join=True``: the sessionize_salted time-slice pattern —
    both sides additionally join on a lookback-width time bucket,
    touches exploded into their own and the NEXT bucket. Any
    qualifying pair has floor(touch/lb) ∈ {floor(conv/lb)-1,
    floor(conv/lb)}, so the exploded touch covers the conv's bucket
    in exactly ONE of its two copies: output is identical by
    construction (no dedup step), equality pinned at 10x-hot-user
    scale in tests/test_scale_contracts.py. Per-user join cost falls
    from C×T to Σ_b C_b × (T_b + T_{b-1}) — bounded by activity per
    lookback window, not by total history."""
    window = (F.col("__touch_us") < F.col("__conv_us")) & (
        F.col("__touch_us") >= F.col("__conv_us") - F.lit(lb_us)
    )
    if not slice_join:
        return conv.join(touch, "__u").where(window)
    cb = conv.withColumn("__b", F.floor(F.col("__conv_us") / F.lit(lb_us)))
    tb = touch.withColumn(
        "__tb", F.floor(F.col("__touch_us") / F.lit(lb_us))
    ).withColumn(
        "__b", F.explode(F.array(F.col("__tb"), F.col("__tb") + 1))
    ).drop("__tb")
    return cb.join(tb, ["__u", "__b"]).where(window).drop("__b")


def attribution_linear(
    events: DataFrame,
    *,
    touch_types: list[str],
    conversion_type: str,
    lookback_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    slice_join: bool = False,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value is
    split EQUALLY across that user's touch events strictly before it
    and within ``lookback_seconds`` (window ``[conv - lookback,
    conv)``). Returns one row per touch type — (touch_type, touches,
    credited_value) — plus an ``__unattributed`` row for conversions
    with no in-window touches (count + their full value).

    Scale shape: conversions ⋈ touches is a single co-partitioned
    shuffle join on the user key with the time predicate applied in
    the join filter; per-conversion touch counts reuse the same
    partitioning. Per-user event counts bound the join fan-out, the
    same skew envelope as sessionization. Value math: per-touch
    credit = grid-6(grid-2(value) / n_touches), summed as grid-6
    addends into a grid-2 total — order-invariant, engine-identical.
    """
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    lb_us = int(lookback_seconds) * 1_000_000
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__conv_id"),
        F.unix_micros(F.col(ts_col)).alias("__conv_us"),
        grid(F.col(value_col), 2).alias("__val"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("touch_type"),
        F.unix_micros(F.col(ts_col)).alias("__touch_us"),
    )
    j = _windowed_pairs(conv, touch, lb_us, slice_join)
    counts = j.groupBy("__conv_id").agg(F.count(F.lit(1)).alias("__n"))
    credited = (
        j.join(counts, "__conv_id")
        .select(
            "touch_type",
            grid(F.col("__val") / F.col("__n"), 6).alias("__credit"),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            grid(F.sum("__credit"), 2).alias("credited_value"),
        )
    )
    unattributed = (
        conv.join(j.select("__conv_id").distinct(), "__conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            grid(F.coalesce(F.sum("__val"), F.lit(0.0)), 2).alias("credited_value"),
        )
        .select(F.lit("__unattributed").alias("touch_type"), "touches", "credited_value")
    )
    return credited.unionByName(unattributed)


def attribution_position(
    events: DataFrame,
    *,
    touch_types: list[str],
    conversion_type: str,
    lookback_seconds: int,
    model: str = "last",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    slice_join: bool = False,
) -> DataFrame:
    """Position-based single-touch attribution: each conversion's FULL
    value goes to its first (``model='first'``) or last
    (``model='last'``) in-window touch — the other two standard
    models next to :func:`attribution_linear`. Same window semantics
    (strictly before, closed lower bound); same-timestamp ties break
    deterministically via min_by/max_by over the (ts, type) struct:
    the lexicographically SMALLER touch type wins for ``'first'``,
    the LARGER for ``'last'``. Output schema matches
    attribution_linear: (touch_type, touches, credited_value) plus
    ``__unattributed``. One co-partitioned user join + one
    conversion-grain min_by/max_by aggregate — no window sort."""
    if model not in ("first", "last"):
        raise ValueError("model must be 'first' or 'last'")
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    lb_us = int(lookback_seconds) * 1_000_000
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__conv_id"),
        F.unix_micros(F.col(ts_col)).alias("__conv_us"),
        grid(F.col(value_col), 2).alias("__val"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("touch_type"),
        F.unix_micros(F.col(ts_col)).alias("__touch_us"),
    )
    j = _windowed_pairs(conv, touch, lb_us, slice_join)
    # deterministic pick: order by (ts, type) — min_by/max_by over a
    # struct compares fields left-to-right
    ordkey = F.struct(F.col("__touch_us"), F.col("touch_type"))
    pick = F.min_by("touch_type", ordkey) if model == "first" else F.max_by(
        "touch_type", ordkey
    )
    chosen = j.groupBy("__conv_id").agg(
        pick.alias("touch_type"), F.first("__val").alias("__val")
    )
    credited = chosen.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("touches"),
        grid(F.sum("__val"), 2).alias("credited_value"),
    )
    unattributed = (
        conv.join(chosen.select("__conv_id"), "__conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            grid(F.coalesce(F.sum("__val"), F.lit(0.0)), 2).alias("credited_value"),
        )
        .select(F.lit("__unattributed").alias("touch_type"), "touches", "credited_value")
    )
    return credited.unionByName(unattributed)


def attribution_all_models(
    events: DataFrame,
    *,
    touch_types: list[str],
    conversion_type: str,
    lookback_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    slice_join: bool = False,
) -> DataFrame:
    """All three attribution models from ONE conversions ⋈ touches
    join (the serving shape when a report wants linear AND positional
    views): returns (model, touch_type, touches, credited_value) with
    model in {linear, first, last}, INCLUDING one ``__unattributed``
    row per model (the same unattributed conversion set, so the three
    rows carry identical numbers — emitted per model so each model's
    slice is a complete report equal to its standalone operator).
    Semantics identical to :func:`attribution_linear` /
    :func:`attribution_position` row-for-row (equality pinned in
    tests/test_funnel.py, __unattributed included). Per-conversion
    touch counts come from a count window over the conversion key —
    the join output shuffles once on conv_id and every model folds
    from that same frame; the shared subtree is deduplicated by
    Spark's exchange reuse, not a session-lifetime ``cache()`` (the
    r7 advisor flagged the leak: an operator must not mutate global
    session cache state)."""
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    lb_us = int(lookback_seconds) * 1_000_000
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("__conv_id"),
        F.unix_micros(F.col(ts_col)).alias("__conv_us"),
        grid(F.col(value_col), 2).alias("__val"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("touch_type"),
        F.unix_micros(F.col(ts_col)).alias("__touch_us"),
    )
    j = _windowed_pairs(conv, touch, lb_us, slice_join)
    w = Window.partitionBy("__conv_id")
    j2 = j.withColumn("__n", F.count(F.lit(1)).over(w))

    linear = (
        j2.select("touch_type", grid(F.col("__val") / F.col("__n"), 6).alias("__credit"))
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            grid(F.sum("__credit"), 2).alias("credited_value"),
        )
        .select(F.lit("linear").alias("model"), "touch_type", "touches", "credited_value")
    )
    ordkey = F.struct(F.col("__touch_us"), F.col("touch_type"))
    picks = j2.groupBy("__conv_id").agg(
        F.min_by("touch_type", ordkey).alias("__first"),
        F.max_by("touch_type", ordkey).alias("__last"),
        F.first("__val").alias("__val"),
    )

    def _pos(col: str, tag: str) -> DataFrame:
        return (
            picks.groupBy(F.col(col).alias("touch_type"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("touches"),
                grid(F.sum("__val"), 2).alias("credited_value"),
            )
            .select(F.lit(tag).alias("model"), "touch_type", "touches", "credited_value")
        )

    # one __unattributed row PER MODEL (identical numbers — the same
    # conversion set is unattributed under every model) so each
    # model's slice equals its standalone operator's full output
    unattributed = (
        conv.join(j.select("__conv_id").distinct(), "__conv_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("long").alias("touches"),
            grid(F.coalesce(F.sum("__val"), F.lit(0.0)), 2).alias("credited_value"),
        )
        .select(
            F.explode(
                F.array(F.lit("linear"), F.lit("first"), F.lit("last"))
            ).alias("model"),
            F.lit("__unattributed").alias("touch_type"),
            "touches",
            "credited_value",
        )
    )
    return (
        linear.unionByName(_pos("__first", "first"))
        .unionByName(_pos("__last", "last"))
        .unionByName(unattributed)
    )


def trailing_window_counts(
    events: DataFrame,
    *,
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event trailing activity: for every event, the number of
    events by the SAME user in the closed interval
    ``[ts - window, ts]`` — the burst / rate-limit feature. A
    time-RANGE window frame (not a row frame): ordered by integer
    epoch microseconds with an integer range bound, so Spark and
    DuckDB agree exactly and ties (same-microsecond events) are
    handled identically by the frame semantics rather than by row
    order. One shuffle on the user key."""
    window_us = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_us, 0)
    )
    return events.withColumn("trailing_count", F.count(F.lit(1)).over(w))


def burst_stats(
    events: DataFrame,
    *,
    window_seconds: int,
    key_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Burst summary per ``key_col``: the max and grid-4 mean trailing
    per-user event count within ``window_seconds``. The trailing count
    partitions by (user, key) so a burst means one user hammering one
    event type — the abuse-detection grain."""
    window_us = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(user_col, key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_us, 0)
    )
    counted = events.withColumn("__tc", F.count(F.lit(1)).over(w))
    return counted.groupBy(key_col).agg(
        F.max("__tc").cast("long").alias("max_trailing"),
        grid(F.sum("__tc") / F.count(F.lit(1)), 4).alias("avg_trailing"),
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    z: float = 3.0,
) -> DataFrame:
    """Robust per-key outlier detection: a row is an outlier when
    |value - median| > z * 1.4826 * MAD (the median absolute
    deviation). Returns one row per key: (key, n, median, mad,
    n_outliers).

    Determinism: the median and the MAD are snapped to the 1e-6 grid
    IMMEDIATELY after interpolation, before anything derives from
    them — so a last-ulp difference between Spark ``percentile`` and
    DuckDB ``quantile_cont`` interpolation can never propagate into
    the deviation values or the outlier threshold. Every downstream
    comparison is then bitwise identical across engines.
    """
    med = df.groupBy(key_col).agg(
        grid(F.percentile(F.col(value_col), F.lit(0.5)), 6).alias("__med")
    )
    dev = df.join(F.broadcast(med), key_col).select(
        key_col,
        F.col("__med"),
        F.abs(F.col(value_col) - F.col("__med")).alias("__dev"),
    )
    mad = dev.groupBy(key_col).agg(
        grid(F.percentile(F.col("__dev"), F.lit(0.5)), 6).alias("__mad")
    )
    scored = dev.join(F.broadcast(mad), key_col)
    return scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("__med").alias("median"),
        F.first("__mad").alias("mad"),
        F.sum(
            (
                grid(F.col("__dev"), 6)
                > grid(F.lit(float(z)) * F.lit(MAD_SIGMA) * F.col("__mad"), 6)
            ).cast("long")
        ).alias("n_outliers"),
    )
