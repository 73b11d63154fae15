"""Temporal join operators Spark lacks as built-ins, composed from
DataFrame primitives (the (a)-strategy of the custom-operator ladder:
composition before Pandas UDFs before mapPartitions).

- as-of join: for each left row, the latest right row with the same
  key and right_ts <= left_ts. Implemented as union + partitioned
  window last-value carry-forward: ONE shuffle on the key, no
  row-at-a-time logic, no state — scales like any window aggregate.
- range join: point-in-interval equi-ification by binning both sides
  to fixed-width buckets, joining on the bucket, then refining with
  the exact predicate. Turns an O(n·m) theta-join into a bucket hash
  join — the standard Spark range-join trick (Databricks' range-join
  hint does the same under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: each left row gains the most recent right row
    (same ``key``, ``right_ts`` <= ``left_ts``); ties on equal
    timestamps prefer the right row (standard as-of backward
    semantics). Left rows with no prior right row keep NULLs.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    left_types = dict(left.dtypes)
    # the right row travels as ONE struct so the carry is atomic: a
    # right row with NULLs in some columns must never yield an output
    # row stitched together from different right rows (which a
    # per-column last(ignorenulls) carry would do)
    rstruct = F.struct(*[F.col(c) for c in right_cols])
    rstruct_type = right.select(rstruct.alias("r")).schema["r"].dataType
    lhs = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    rhs = right.select(
        *[
            (F.col(key) if c == key else F.lit(None).cast(left_types[c])).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    unioned = lhs.unionByName(rhs)
    # right rows sort before left rows at equal __t (side 0 < 1) so a
    # same-instant right row is visible to the left row
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select("*", F.last("__r", ignorenulls=True).over(w).alias("__carry"))
    return carried.where(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join point rows to interval rows where
    ``lo_col <= point < hi_col``, via bucket equi-join + refine.
    Intervals spanning multiple buckets are exploded once per bucket
    (cost ∝ interval length / bucket_width — pick the width near the
    median interval length)."""
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__bucket").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Gap-based batch sessionization: within each key, a new session
    starts whenever the time since the previous event reaches ``gap``.
    Adds ``session_seq`` (1-based per-key session ordinal) and a
    globally unique ``session_id`` string ``"<key>#<seq>"`` (an exact
    composite key, not a hash — 64-bit hashes birthday-collide at the
    billions-of-sessions scale this module targets).

    The batch counterpart of the streaming session window
    (plans/streaming_plans.py) — reference parity is the ad-hoc
    analytics surface; the gap rule matches Spark's
    ``session_window`` semantics exactly: a session window spans
    [start, last + gap), so an event at precisely last + gap falls
    OUTSIDE it (boundary when ts - prev_ts >= gap).

    Plan shape / 100 TB: ONE shuffle (window partitioned by the key);
    the boundary flag is a lag comparison and the ordinal a running
    sum over the same window spec, so both windows share one sort.
    ``order_cols`` break timestamp ties deterministically. Hot keys
    (one user with millions of events) sort within one partition —
    the same skew profile as any per-entity window; use
    :func:`sessionize_salted` (time-sliced two-phase, output-equal)
    when a single entity exceeds a partition."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col).cast("timestamp") >= prev_ts + gap_expr),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = events.withColumn("__new", is_new).withColumn(
        "session_seq",
        F.sum("__new").over(
            Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return out.drop("__new").withColumn(
        "session_id",
        F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("session_seq")),
    )


def sessionize_salted(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    slice_sec: int = 86_400,
) -> DataFrame:
    """Hot-key-safe two-phase sessionization, output-identical to
    :func:`sessionize` (proven in tests/test_sessionize.py on both the
    real events table and a one-key-owns-half-the-events corpus).

    :func:`sessionize` sorts each key inside ONE window partition, so
    a single entity with millions of events serializes on one task —
    the skew its docstring punted upstream. This variant salts by TIME
    instead of by hash (a hash salt can't work here: sessions need
    contiguous time ranges):

    1. slice each key's events into fixed ``slice_sec`` time slices
       (``floor(ts / slice_sec)`` — a pure column expr, no shuffle of
       its own) and sessionize WITHIN (key, slice). The window
       partition is now (key, slice): a hot key splits across
       time, bounding any one task at the key's densest slice.
    2. repair the slice boundaries at the SESSION level: per (key,
       slice, local_seq) take [min ts, max ts]; order the per-key
       session intervals by start and re-apply the gap rule — a
       session merges into its predecessor iff start − prev_end <
       gap. Only the first event of each slice can differ from the
       global rule (its true previous event sits in the prior slice),
       and that is exactly the session-level comparison. A running
       sum over merge boundaries renumbers ``session_seq`` globally;
       events join back on (key, slice, local_seq).

    The phase-2 window is still per-key but over SESSION rows, whose
    per-key count is bounded by time_range/gap + n_slices regardless
    of event density (gap-separation caps sessions per slice at
    slice_sec/gap + 1) — so the skew bound no longer depends on how
    many events the hot key has. Pick ``slice_sec`` ≫ gap (default
    1 day vs 30 min) so phase-2 stays tiny.

    Cost: two key shuffles (phase-1 window + the session join) vs one
    — the price of the bound; use :func:`sessionize` when no key
    exceeds a partition (PROFILE_r06 §4 measured the salted variant
    2.1x slower on the skewless 750k-event corpus), or let
    :func:`sessionize_auto` pick from the per-key count."""
    gap_expr = F.expr(f"INTERVAL {gap}")
    sliced = events.withColumn(
        "__slice", F.floor(F.col(ts_col).cast("double") / slice_sec).cast("long")
    )
    w = Window.partitionBy(key_col, "__slice").orderBy(ts_col, *order_cols)
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col).cast("timestamp") >= prev_ts + gap_expr),
        F.lit(1),
    ).otherwise(F.lit(0))
    local = sliced.withColumn("__new", is_new).withColumn(
        "__local_seq",
        F.sum("__new").over(
            Window.partitionBy(key_col, "__slice").orderBy(ts_col, *order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new")

    sessions = local.groupBy(key_col, "__slice", "__local_seq").agg(
        F.min(ts_col).alias("__start"), F.max(ts_col).alias("__end")
    )
    # per-key session intervals are disjoint and start-ordered (slice
    # boundaries are ts-functions, so cross-slice order follows time)
    sw = Window.partitionBy(key_col).orderBy("__start", "__slice", "__local_seq")
    prev_end = F.lag("__end").over(sw)
    merge_new = F.when(
        prev_end.isNull()
        | (F.col("__start").cast("timestamp") >= prev_end + gap_expr),
        F.lit(1),
    ).otherwise(F.lit(0))
    renumbered = sessions.withColumn(
        "session_seq",
        F.sum(merge_new).over(
            Window.partitionBy(key_col).orderBy("__start", "__slice", "__local_seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(key_col, "__slice", "__local_seq", "session_seq")

    return (
        local.join(renumbered, [key_col, "__slice", "__local_seq"])
        .drop("__slice", "__local_seq")
        .withColumn(
            "session_id",
            F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("session_seq")),
        )
    )


def sessionize_auto(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    slice_sec: int = 86_400,
    hot_key_events: int = 2_000_000,
) -> DataFrame:
    """Dispatch between :func:`sessionize` (one shuffle, fastest when
    no key is hot) and :func:`sessionize_salted` (two shuffles, skew
    bound independent of event density) from a cheap measured skew
    statistic, so callers get the hot-key bound without hand-tuning
    (r6 verdict #8).

    The statistic is the MAX per-key event count — the exact quantity
    the unsalted variant's single-task sort is bounded by (a lower
    quantile would miss the one pathological key that motivates
    salting). Measuring it is one partial-agg key-grain count plus a
    scalar max — a bounded ``collect()`` (one row), far cheaper than
    either variant's window sort, and the groupBy count is the same
    shuffle key the chosen variant reuses.

    ``hot_key_events`` defaults to 2M rows: a single in-partition sort
    of ~2M narrow rows is comfortably in-memory on a standard
    executor; past that the sort spills and the salted bound wins
    (PROFILE_r06 §4: crossover not yet reached at 750k TOTAL events,
    so the threshold is deliberately above any local-test corpus).
    Both branches are output-identical (tests/test_sessionize.py), so
    the dispatch can never change results — only the plan."""
    max_per_key = (
        events.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("m"))
        .collect()[0]["m"]
    )
    if max_per_key is not None and max_per_key > hot_key_events:
        return sessionize_salted(
            events, gap=gap, key_col=key_col, ts_col=ts_col,
            order_cols=order_cols, slice_sec=slice_sec,
        )
    return sessionize(
        events, gap=gap, key_col=key_col, ts_col=ts_col, order_cols=order_cols
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    value_agg: F.Column | None = None,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: start/end, event
    count, duration seconds, and (optionally) the value sum. Same
    single key-shuffle; the groupBy reuses the session keys.
    ``value_agg`` overrides the value aggregate (e.g. a grid-snapped
    sum for oracle-bearing plans) so callers never re-implement the
    duration math."""
    s = sessionize(events, gap=gap, key_col=key_col, ts_col=ts_col, order_cols=order_cols)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # floor of the FRACTIONAL difference (not a difference of
        # floored endpoints, which over-counts by 1 when the start's
        # sub-second part exceeds the end's)
        F.floor(
            F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))
        ).cast("long").alias("duration_sec"),
    ]
    if value_agg is not None:
        aggs.append(value_agg)
    elif value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return s.groupBy(key_col, "session_seq").agg(*aggs)
