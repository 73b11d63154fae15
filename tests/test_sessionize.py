"""Batch sessionization (operators/temporal.py::sessionize /
session_stats): exact DuckDB window-SQL value oracle on the events
table, plus contract checks (gap boundary inclusive/exclusive, tie
determinism, single-shuffle plan)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.temporal import (
    session_stats,
    sessionize,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

ORACLE_SESS = """
WITH ordered AS (
  SELECT event_id, user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
)
SELECT event_id, user_id,
       SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_seq
FROM flagged
"""


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    return con


def test_sessionize_duckdb_oracle(spark):
    events = table(spark, SF_CORRECTNESS, "events")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(events, gap="30 minutes").select("event_id", "session_seq").collect()
    }
    con = _con(SF_CORRECTNESS)
    want = {eid: seq for eid, _, seq in con.execute(ORACLE_SESS).fetchall()}
    con.close()
    assert got == want
    assert max(want.values()) > 1  # corpus actually splits into sessions


def test_session_stats_duckdb_oracle(spark):
    events = table(spark, SF_CORRECTNESS, "events")
    got = sorted(
        (
            r["user_id"], r["session_seq"], r["session_start"], r["session_end"],
            r["n_events"], r["duration_sec"], round(r["value_sum"], 6),
        )
        for r in session_stats(events, gap="30 minutes").collect()
    )
    con = _con(SF_CORRECTNESS)
    want = sorted(
        (u, int(seq), st, en, n, int(d), round(v, 6))
        for u, seq, st, en, n, d, v in con.execute(f"""
            WITH sess AS ({ORACLE_SESS.replace("SELECT event_id, user_id,",
                                               "SELECT event_id, user_id, ts, value,")})
            SELECT user_id, session_seq, min(ts), max(ts), count(*),
                   floor(epoch(max(ts)) - epoch(min(ts))), sum(value)
            FROM sess GROUP BY user_id, session_seq
        """).fetchall()
    )
    con.close()
    assert got == want


def test_sessionize_gap_boundary_and_ties(spark):
    """Boundary semantics match F.session_window: the window spans
    [start, last + gap), so exactly-gap spacing STARTS a new session
    (>= gap splits); equal timestamps tie-break on event_id so the
    assignment is deterministic."""
    rows = [
        # user 1: 0s, +30m-1s (same session), then +30m exactly (new)
        (1, 7, "2026-01-01 00:00:00", 1.0),
        (2, 7, "2026-01-01 00:29:59", 1.0),
        (3, 7, "2026-01-01 00:59:59", 1.0),
        # user 2: equal timestamps
        (4, 8, "2026-01-01 00:00:00", 1.0),
        (5, 8, "2026-01-01 00:00:00", 1.0),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    seqs = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert seqs[1] == 1 and seqs[2] == 1  # 29m59s: same session
    assert seqs[3] == 2                   # exactly 30m after event 2: new
    assert seqs[4] == 1 and seqs[5] == 1  # simultaneous: one session
    ids = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert ids[1] == ids[2] != ids[3]     # session_id unique per (key, seq)


def test_sessionize_plan_single_shuffle(spark):
    """Both windows and the stats groupBy reuse ONE key shuffle."""
    events = table(spark, SF_CORRECTNESS, "events")
    plan = (
        session_stats(events)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # key shuffle (+ AQE read), never per-window
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sessionize_salted_equals_unsalted_on_corpus(spark):
    """The time-sliced two-phase variant must be output-IDENTICAL to
    the single-window operator on the real corpus — with a slice width
    (1h) deliberately close to the gap (30m) so many sessions cross
    slice boundaries and the phase-2 repair is genuinely exercised."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_salted,
    )

    events = table(spark, SF_CORRECTNESS, "events")
    cols = ("event_id", "user_id", "session_seq", "session_id")
    a = sorted(tuple(r[c] for c in cols) for r in sessionize(events).collect())
    b = sorted(
        tuple(r[c] for c in cols)
        for r in sessionize_salted(events, slice_sec=3600).collect()
    )
    assert a == b
    # non-vacuous: some sessions DID span a slice boundary (phase-2
    # merged local sessions), i.e. slicing alone over-segments
    sliced_only = (
        events.withColumn("__slice", (F.col("ts").cast("double") / 3600).cast("long"))
        .groupBy("user_id", "__slice").count().count()
    )
    n_sessions = len({(u, s) for _, u, s, _ in a for u, s in [(u, s)]})
    assert sliced_only > n_sessions


def test_sessionize_salted_boundary_cases(spark):
    """Slice-boundary repair semantics: a session continuing across a
    slice boundary merges; an exactly-gap spacing across the boundary
    splits (same >= gap rule as the unsalted operator)."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_salted,
    )

    rows = [
        # user 1: event just before a 1h-slice boundary, next 10 min
        # later in the next slice -> ONE session across the boundary
        (1, 7, "2026-01-01 00:55:00", 1.0),
        (2, 7, "2026-01-01 01:05:00", 1.0),
        # then exactly 30m later -> new session (>= gap splits)
        (3, 7, "2026-01-01 01:35:00", 1.0),
        # user 2: chain spanning THREE slices via short steps
        (4, 8, "2026-01-01 00:59:00", 1.0),
        (5, 8, "2026-01-01 01:28:00", 1.0),
        (6, 8, "2026-01-01 01:57:00", 1.0),
        (7, 8, "2026-01-01 02:20:00", 1.0),
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize_salted(df, slice_sec=3600).collect()}
    want = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert got == want
    assert got[1] == got[2] == 1 and got[3] == 2
    assert got[4] == got[5] == got[6] == got[7] == 1


def test_sessionize_salted_equals_unsalted_on_hot_key(spark):
    """One key owning ~half the events (the skew regime the salted
    variant exists for): outputs still identical."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_salted,
    )

    events = table(spark, SF_CORRECTNESS, "events")
    hot = events.withColumn(
        "user_id",
        F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, F.lit(999_999)).otherwise(
            F.col("user_id")
        ),
    )
    cols = ("event_id", "user_id", "session_seq", "session_id")
    a = sorted(tuple(r[c] for c in cols) for r in sessionize(hot).collect())
    b = sorted(
        tuple(r[c] for c in cols)
        for r in sessionize_salted(hot, slice_sec=3600).collect()
    )
    assert a == b


def test_sessionize_auto_dispatch_and_equality(spark):
    """r7 (r6 verdict #8): the auto-dispatcher picks the variant from
    the measured max per-key count and both branches yield the exact
    sessionize output. Branch choice is forced both ways via the
    threshold so each path is actually exercised."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_auto,
    )

    events = table(spark, SF_CORRECTNESS, "events")
    cols = ("event_id", "user_id", "session_seq", "session_id")
    expect = sorted(tuple(r[c] for c in cols) for r in sessionize(events).collect())

    # default threshold (2M) >> any local key count -> unsalted branch
    auto = sessionize_auto(events)
    assert sorted(tuple(r[c] for c in cols) for r in auto.collect()) == expect
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # single-window variant chosen

    # threshold 1 forces the salted branch; output must not change
    salted = sessionize_auto(events, hot_key_events=1, slice_sec=3600)
    assert sorted(tuple(r[c] for c in cols) for r in salted.collect()) == expect
    splan = salted._jdf.queryExecution().executedPlan().toString()
    assert splan.count("Exchange") > 2  # two-phase variant chosen


def test_batch_sessionize_agrees_with_streaming_oracle(spark):
    """The two sessionization surfaces — the batch operator
    (operators/temporal.sessionize) and the streaming stateful
    operator's batch oracle (streaming/stateful.sessionize_batch) —
    implement the same gap rule and must produce identical sessions
    on the same events (same gap; boundaries depend only on the
    timestamp sequence, so tie-order differences cannot move them)."""
    from lakehouse_file_format_compare_spark.streaming.stateful import (
        sessionize_batch,
    )

    events = table(spark, SF_CORRECTNESS, "events")
    a = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_stats(events, gap="5 minutes").collect()
    )
    b = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(events, gap_seconds=300).collect()
    )
    assert a == b
