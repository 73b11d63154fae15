"""Behavioral-analytics operators (operators/funnel.py): funnel
conversion, cohort retention and MAD outliers. The full sf0.01
DuckDB replay runs via tests/test_correctness.py::test_oracle_match
[events_analytics_suite]; these tests pin the SEMANTICS on hand-built
frames (ordering strictness, span cutoff, cohort arithmetic, the
outlier threshold) plus the plan shape and empty inputs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.funnel import (
    attribution_linear,
    burst_stats,
    funnel_counts,
    funnel_user_steps,
    mad_outliers,
    retention_matrix,
    trailing_window_counts,
)

TS = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


STEPS = ["signup", "view", "purchase"]


def test_funnel_requires_strict_order(spark):
    # user 1: view BEFORE signup, purchase after — reaches step 1 and
    # step 3 never (step 2 missing breaks the chain);
    # user 2: clean signup -> view -> purchase.
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 10), 1, "view"),
        (2, TS(2024, 1, 1, 11), 1, "signup"),
        (3, TS(2024, 1, 1, 12), 1, "purchase"),
        (4, TS(2024, 1, 2, 9), 2, "signup"),
        (5, TS(2024, 1, 2, 10), 2, "view"),
        (6, TS(2024, 1, 2, 11), 2, "purchase"),
    ])
    rows = {
        r["user_id"]: r
        for r in funnel_user_steps(ev, STEPS).collect()
    }
    assert rows[1]["step1_ts"] == TS(2024, 1, 1, 11)
    assert rows[1]["step2_ts"] is None
    assert rows[1]["step3_ts"] is None  # chain broken at step 2
    assert rows[2]["step3_ts"] == TS(2024, 1, 2, 11)

    counts = {r["step_name"]: r for r in funnel_counts(ev, STEPS).collect()}
    assert counts["signup"]["users"] == 2
    assert counts["view"]["users"] == 1
    assert counts["purchase"]["users"] == 1
    assert counts["purchase"]["conversion"] == 0.5


def test_funnel_span_cutoff_measured_from_step1(spark):
    # view lands 2h after signup — inside a 3h span; purchase lands 4h
    # after signup — outside it even though it's 2h after the view.
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0), 1, "signup"),
        (2, TS(2024, 1, 1, 2), 1, "view"),
        (3, TS(2024, 1, 1, 4), 1, "purchase"),
    ])
    row = funnel_user_steps(ev, STEPS, max_span_seconds=3 * 3600).collect()[0]
    assert row["step2_ts"] == TS(2024, 1, 1, 2)
    assert row["step3_ts"] is None


def test_funnel_picks_earliest_valid_event(spark):
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0), 1, "signup"),
        (2, TS(2024, 1, 1, 5), 1, "signup"),   # later signup ignored
        (3, TS(2024, 1, 1, 1), 1, "view"),
        (4, TS(2024, 1, 1, 2), 1, "view"),     # second view ignored
    ])
    row = funnel_user_steps(ev, ["signup", "view"]).collect()[0]
    assert row["step1_ts"] == TS(2024, 1, 1, 0)
    assert row["step2_ts"] == TS(2024, 1, 1, 1)


def test_funnel_user_missing_first_step(spark):
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0), 1, "view"),
        (2, TS(2024, 1, 1, 1), 1, "purchase"),
    ])
    row = funnel_user_steps(ev, STEPS).collect()[0]
    assert row["step1_ts"] is None and row["step2_ts"] is None
    counts = {r["step_name"]: r for r in funnel_counts(ev, STEPS).collect()}
    assert counts["signup"]["users"] == 0
    # nobody entered the funnel: conversions are defined as 0.0
    assert counts["signup"]["conversion"] == 0.0


def test_funnel_single_shuffle_plan(spark):
    """The K-step funnel costs ONE Exchange of the event table: every
    conditional-min window and the closing aggregate share the user
    partitioning (the 100 TB contract in the module docstring)."""
    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    df = funnel_user_steps(ev, STEPS)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted mode prints each node twice (tree + detail section);
    # "Exchange (" matches the tree entry only
    assert plan.count("Exchange (") == 1, plan
    assert "BatchEvalPython" not in plan


def test_retention_cohort_arithmetic(spark):
    # two users: A first active day 0 (cohort 0), B first active day 8
    # (cohort 1, 7-day periods); A returns in period 1, B never does.
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 12), 1, "view"),
        (2, TS(2024, 1, 9, 12), 1, "view"),    # day 8 -> offset 1
        (3, TS(2024, 1, 9, 13), 2, "view"),    # cohort 1
    ])
    out = {
        (r["cohort"], r["offset"]): r
        for r in retention_matrix(
            ev, origin="2024-01-01", period_seconds=7 * 86400
        ).collect()
    }
    assert out[(0, 0)]["retained"] == 1
    assert out[(0, 1)]["retained"] == 1
    assert out[(0, 1)]["retention_rate"] == 1.0
    assert out[(1, 0)]["retained"] == 1
    assert (1, 1) not in out


def test_retention_rate_denominator_is_cohort_size(spark):
    ev = _events(spark, [
        (1, TS(2024, 1, 1), 1, "view"),
        (2, TS(2024, 1, 2), 2, "view"),
        (3, TS(2024, 1, 3), 3, "view"),
        (4, TS(2024, 1, 10), 1, "view"),  # only 1 of 3 returns
    ])
    out = {
        (r["cohort"], r["offset"]): r["retention_rate"]
        for r in retention_matrix(
            ev, origin="2024-01-01", period_seconds=7 * 86400
        ).collect()
    }
    assert out[(0, 0)] == 1.0
    assert abs(out[(0, 1)] - 0.3333) < 1e-9  # grid-4 of 1/3


def test_mad_outliers_threshold(spark):
    # 9 inliers at 10..18 (median 14, MAD 2 -> threshold 8.8956) and
    # one far point: |100 - 14| = 86 -> exactly one outlier.
    rows = [("k", float(v)) for v in range(10, 19)] + [("k", 100.0)]
    df = spark.createDataFrame(rows, "key string, value double")
    out = mad_outliers(df, "key", "value").collect()[0]
    assert out["n"] == 10
    assert out["median"] == 14.5  # 10 values: (14+15)/2
    assert out["mad"] == 2.5
    assert out["n_outliers"] == 1


def test_mad_outliers_constant_series_flags_any_deviation(spark):
    # constant series: MAD 0 -> any deviating point is an outlier
    rows = [("k", 5.0)] * 6 + [("k", 5.1)]
    df = spark.createDataFrame(rows, "key string, value double")
    out = mad_outliers(df, "key", "value").collect()[0]
    assert out["mad"] == 0.0
    assert out["n_outliers"] == 1


def test_trailing_window_closed_interval(spark):
    # events at t, t+60s, t+3660s with a 1h window: the 60s-later
    # event sees 2 (window is CLOSED: [ts-3600s, ts]); the event
    # exactly 3600s after the second one still includes it.
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, "view"),
        (2, TS(2024, 1, 1, 0, 1, 0), 1, "view"),
        (3, TS(2024, 1, 1, 1, 1, 0), 1, "view"),  # exactly 1h after #2
    ])
    out = {
        r["event_id"]: r["trailing_count"]
        for r in trailing_window_counts(ev, window_seconds=3600).collect()
    }
    assert out[1] == 1
    assert out[2] == 2
    assert out[3] == 2  # includes #2 (boundary), not #1


def test_trailing_window_same_timestamp_peers(spark):
    # RANGE frames include ALL rows with the same ordering value, so
    # two same-microsecond events each count the other — row order
    # never matters (the determinism property row frames lack).
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0, 0, 0), 1, "view"),
        (2, TS(2024, 1, 1, 0, 0, 0), 1, "view"),
    ])
    counts = [
        r["trailing_count"]
        for r in trailing_window_counts(ev, window_seconds=60).collect()
    ]
    assert counts == [2, 2]


def test_burst_stats_partitions_by_user_and_type(spark):
    # user 1 fires 3 views in a minute (burst); user 2's single view
    # and user 1's single click must not inflate each other.
    ev = _events(spark, [
        (1, TS(2024, 1, 1, 0, 0), 1, "view"),
        (2, TS(2024, 1, 1, 0, 1), 1, "view"),
        (3, TS(2024, 1, 1, 0, 2), 1, "view"),
        (4, TS(2024, 1, 1, 0, 3), 1, "click"),
        (5, TS(2024, 1, 1, 0, 0), 2, "view"),
    ])
    out = {r["event_type"]: r for r in burst_stats(ev, window_seconds=3600).collect()}
    assert out["view"]["max_trailing"] == 3
    assert out["click"]["max_trailing"] == 1
    # view trailing counts: user1 -> 1,2,3; user2 -> 1; avg = 7/4
    assert out["view"]["avg_trailing"] == 1.75


def _events_v(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_attribution_splits_equally_within_lookback(spark):
    # purchase of 30.0 with 2 in-window touches (view + click) and a
    # view OUTSIDE the 1h lookback + a view AT the purchase instant
    # (strictly-before excludes it): 15.0 credited to each touch type.
    ev = _events_v(spark, [
        (1, TS(2024, 1, 1, 8, 0), 1, "view", 0.0),    # outside lookback
        (2, TS(2024, 1, 1, 9, 30), 1, "view", 0.0),
        (3, TS(2024, 1, 1, 9, 45), 1, "click", 0.0),
        (4, TS(2024, 1, 1, 10, 0), 1, "view", 0.0),   # same instant: excluded
        (5, TS(2024, 1, 1, 10, 0), 1, "purchase", 30.0),
    ])
    out = {r["touch_type"]: r for r in attribution_linear(
        ev, touch_types=["view", "click"], conversion_type="purchase",
        lookback_seconds=3600,
    ).collect()}
    assert out["view"]["touches"] == 1 and out["view"]["credited_value"] == 15.0
    assert out["click"]["touches"] == 1 and out["click"]["credited_value"] == 15.0
    assert out["__unattributed"]["touches"] == 0


def test_attribution_unattributed_conversions(spark):
    ev = _events_v(spark, [
        (1, TS(2024, 1, 1, 10), 1, "purchase", 12.5),
        (2, TS(2024, 1, 2, 10), 2, "view", 0.0),   # different user
        (3, TS(2024, 1, 2, 11), 1, "purchase", 7.5),  # no prior touch
    ])
    out = {r["touch_type"]: r for r in attribution_linear(
        ev, touch_types=["view"], conversion_type="purchase",
        lookback_seconds=3600,
    ).collect()}
    assert out["__unattributed"]["touches"] == 2
    assert out["__unattributed"]["credited_value"] == 20.0


def test_attribution_conserves_value(spark):
    """Credited + unattributed must reconstruct total conversion value
    up to grid-6 allocation error (each conversion contributes at most
    n_touches * 5e-7)."""
    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = table(spark, "/root/testdata/sf0.01", "events")
    rows = attribution_linear(
        ev, touch_types=["view", "click"], conversion_type="purchase",
        lookback_seconds=3 * 86400,
    ).collect()
    got = sum(r["credited_value"] for r in rows)
    total = ev.where(F.col("event_type") == "purchase").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)) / 100).alias("t")
    ).collect()[0]["t"]
    assert abs(got - total) < 0.05, (got, total)


def test_attribution_position_models(spark):
    from lakehouse_file_format_compare_spark.operators.funnel import (
        attribution_position,
    )

    ev = _events_v(spark, [
        (1, TS(2024, 1, 1, 9, 0), 1, "view", 0.0),
        (2, TS(2024, 1, 1, 9, 30), 1, "click", 0.0),
        (3, TS(2024, 1, 1, 10, 0), 1, "purchase", 40.0),
        (4, TS(2024, 1, 2, 10, 0), 2, "purchase", 5.0),  # unattributed
    ])
    kw = dict(touch_types=["view", "click"], conversion_type="purchase",
              lookback_seconds=2 * 3600)
    first = {r["touch_type"]: r for r in attribution_position(ev, model="first", **kw).collect()}
    last = {r["touch_type"]: r for r in attribution_position(ev, model="last", **kw).collect()}
    assert first["view"]["credited_value"] == 40.0 and "click" not in first
    assert last["click"]["credited_value"] == 40.0 and "view" not in last
    assert first["__unattributed"]["touches"] == 1
    assert first["__unattributed"]["credited_value"] == 5.0


def test_attribution_position_tie_breaks_deterministically(spark):
    from lakehouse_file_format_compare_spark.operators.funnel import (
        attribution_position,
    )

    # two touches at the SAME microsecond: lexicographically smaller
    # type wins for both models' boundary pick ordering
    ev = _events_v(spark, [
        (1, TS(2024, 1, 1, 9, 0), 1, "view", 0.0),
        (2, TS(2024, 1, 1, 9, 0), 1, "click", 0.0),
        (3, TS(2024, 1, 1, 10, 0), 1, "purchase", 10.0),
    ])
    kw = dict(touch_types=["view", "click"], conversion_type="purchase",
              lookback_seconds=2 * 3600)
    first = {r["touch_type"] for r in attribution_position(ev, model="first", **kw).collect()}
    last = {r["touch_type"] for r in attribution_position(ev, model="last", **kw).collect()}
    assert "click" in first   # min over (ts, type)
    assert "view" in last     # max over (ts, type)


def test_attribution_all_models_equals_individual_operators(spark):
    """The fused one-join report must equal the three standalone
    operators row-for-row on real data (sf0.001 events)."""
    from lakehouse_file_format_compare_spark.operators.funnel import (
        attribution_all_models,
        attribution_position,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    kw = dict(touch_types=["view", "click"], conversion_type="purchase",
              lookback_seconds=3 * 86400)
    fused = {
        (r["model"], r["touch_type"]): (r["touches"], r["credited_value"])
        for r in attribution_all_models(ev, **kw).collect()
    }
    lin = {
        ("linear", r["touch_type"]): (r["touches"], r["credited_value"])
        for r in attribution_linear(ev, **kw).collect()
    }
    assert {k: v for k, v in fused.items() if k[0] == "linear"} == lin
    for model in ("first", "last"):
        # full equality, __unattributed INCLUDED (r7 advisor: the
        # fused operator used to omit it for first/last and the test
        # filtered the divergence out instead of pinning it closed)
        solo = {
            (model, r["touch_type"]): (r["touches"], r["credited_value"])
            for r in attribution_position(ev, model=model, **kw).collect()
        }
        assert {k: v for k, v in fused.items() if k[0] == model} == solo


def test_attribution_validation(spark):
    ev = _events_v(spark, [])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        attribution_linear(
            ev, touch_types=["purchase"], conversion_type="purchase",
            lookback_seconds=60,
        )


def _py_funnel(events, steps, max_span_s=None):
    """Pure-Python chained-min reference: events = [(user, ts_epoch_s,
    type)], returns {user: [t1..tk] (None-padded)}."""
    users = {}
    for u, ts, et in events:
        users.setdefault(u, []).append((ts, et))
    out = {}
    for u, evs in users.items():
        chain = [None] * len(steps)
        t1_times = sorted(ts for ts, et in evs if et == steps[0])
        if t1_times:
            chain[0] = t1_times[0]
            deadline = chain[0] + max_span_s if max_span_s else None
            prev = chain[0]
            for i in range(1, len(steps)):
                cands = sorted(
                    ts for ts, et in evs
                    if et == steps[i] and ts > prev
                    and (deadline is None or ts <= deadline)
                )
                if not cands:
                    break
                chain[i] = cands[0]
                prev = cands[0]
        out[u] = chain
    return out


def test_funnel_hypothesis_matches_python_reference(spark):
    """Random small event sets (few users, colliding timestamps, all
    orderings) — the DataFrame chained-window funnel must equal the
    greedy Python reference, with and without a span."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    steps = ["a", "b", "c"]

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),       # user
                st.integers(min_value=0, max_value=50),      # ts (s)
                st.sampled_from(["a", "b", "c", "x"]),       # type
            ),
            min_size=0,
            max_size=25,
        ),
        st.sampled_from([None, 10, 30]),                     # span (s)
    )
    def run(evs, span):
        rows = [
            (i, TS(2024, 1, 1) + dt.timedelta(seconds=ts), u, et)
            for i, (u, ts, et) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        got = {
            r["user_id"]: [
                None if r[f"step{i}_ts"] is None
                else int((r[f"step{i}_ts"] - TS(2024, 1, 1)).total_seconds())
                for i in range(1, 4)
            ]
            for r in funnel_user_steps(df, steps, max_span_seconds=span).collect()
        }
        want = _py_funnel([(u, ts, et) for u, ts, et in evs], steps, span)
        assert got == want

    run()


def test_empty_inputs(spark):
    empty = _events(spark, []).where(F.lit(False))
    assert funnel_user_steps(empty, STEPS).count() == 0
    counts = {r["step_name"]: r for r in funnel_counts(empty, STEPS).collect()}
    assert counts["signup"]["users"] == 0 and counts["signup"]["conversion"] == 0.0
    assert retention_matrix(empty, origin="2024-01-01", period_seconds=86400).count() == 0
    df = spark.createDataFrame([], "key string, value double")
    assert mad_outliers(df, "key", "value").count() == 0
