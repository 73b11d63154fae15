"""Mergeable HLL rollups (operators/sketches.py): in the sparse
(coupon-exact) regime the merged coarse estimate EQUALS the direct
coarse-scan estimate — the events corpus (150 distinct users) pins
that here. In the dense regime the equality breaks (estimator-path
differences, see the module docstring; measured on sf0.01 orders),
so the general contracts are the relative-error envelope against
exact DuckDB distincts and order/partitioning invariance (the latter
pinned in the op_approx_distinct driver row, plans/adhoc.py)."""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.sketches import (
    distinct_rollup_report,
    hll_partial_sketches,
    hll_rollup,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

# lg_k=12 -> ~1.6/sqrt(4096) ≈ 2.5% typical rel err; assert 5%
REL_ERR = 0.05


def test_merged_rollup_equals_direct_sketch(spark):
    """Merging daily sketches to event_type grain gives the SAME
    estimate as sketching at event_type grain directly — exact-equal
    HERE because ~150 distinct users keeps every sketch in the
    coupon-exact sparse regime (the dense-regime envelope contract is
    the test below)."""
    events = table(spark, SF_CORRECTNESS, "events").withColumn(
        "day", F.to_date("ts")
    )
    fine = hll_partial_sketches(events, ["event_type", "day"], "user_id")
    merged = {
        r["event_type"]: r["distinct_est"]
        for r in hll_rollup(fine, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["distinct_est"]
        for r in hll_rollup(
            hll_partial_sketches(events, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct


def test_rollup_estimates_within_error_of_exact(spark):
    events = table(spark, SF_CORRECTNESS, "events").withColumn(
        "day", F.to_date("ts")
    )
    got = {
        r["event_type"]: (r["distinct_est"], r["n_rows"])
        for r in distinct_rollup_report(
            events, ["event_type", "day"], ["event_type"], "user_id"
        ).collect()
    }
    con = duckdb.connect()
    path = os.path.join(SF_CORRECTNESS, "events.parquet")
    exact = {
        t: (d, n)
        for t, d, n in con.execute(
            f"""SELECT event_type, COUNT(DISTINCT user_id), COUNT(*)
                FROM read_parquet('{path}') GROUP BY event_type"""
        ).fetchall()
    }
    con.close()
    assert set(got) == set(exact)
    for t, (est, n_rows) in got.items():
        d, n = exact[t]
        assert n_rows == n  # the exact row count rides along for free
        assert abs(est - d) <= max(REL_ERR * d, 2), (t, est, d)


def test_global_rollup_and_empty_input(spark):
    events = table(spark, SF_CORRECTNESS, "events")
    # rollup to the GLOBAL grain (empty group list)
    est = distinct_rollup_report(events, ["event_type"], [], "user_id").collect()
    assert len(est) == 1
    exact = events.select(F.countDistinct("user_id").alias("d")).collect()[0]["d"]
    assert abs(est[0]["distinct_est"] - exact) <= max(REL_ERR * exact, 2)
    # zero-row input: no groups, no crash
    empty = events.where(F.lit(False))
    assert hll_partial_sketches(empty, ["event_type"], "user_id").count() == 0
