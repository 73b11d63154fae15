"""Percentile summaries (functions/stats.py): exact path value-
oracled against DuckDB quantile_cont; approx (Greenwald-Khanna)
pinned within a rank-error tolerance of exact."""

from __future__ import annotations

import os

import duckdb
import pytest

from lakehouse_file_format_compare_spark.functions.stats import percentile_summary
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

PROBS = (0.25, 0.5, 0.75, 0.95, 0.99)


def test_exact_percentiles_match_duckdb(spark):
    path = os.path.join(SF_CORRECTNESS, "lineitem.parquet")
    got = percentile_summary(
        table(spark, SF_CORRECTNESS, "lineitem"),
        "l_extendedprice",
        PROBS,
        group_cols=("l_returnflag",),
    ).collect()
    con = duckdb.connect()
    cols = ", ".join(
        f"FLOOR(quantile_cont(l_extendedprice, {p}) * 1000000 + 0.5) / 1000000 AS p{f'{p*100:g}'.replace('.','_')}"
        for p in PROBS
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT l_returnflag, {cols} FROM read_parquet('{path}') GROUP BY 1"
        ).fetchall()
    }
    con.close()
    assert len(got) == len(want) > 0
    for r in got:
        w = want[r["l_returnflag"]]
        for i, p in enumerate(PROBS):
            assert r[i + 1] == pytest.approx(w[i], abs=2e-6), (r["l_returnflag"], p)


def test_approx_percentiles_within_rank_tolerance(spark):
    li = table(spark, SF_CORRECTNESS, "lineitem")
    exact = percentile_summary(li, "l_extendedprice", PROBS).collect()[0]
    approx = percentile_summary(li, "l_extendedprice", PROBS, exact=False).collect()[0]
    # rank error <= 1/accuracy; translate to a value tolerance via the
    # empirical spread: approx value must sit between the exact values
    # of p +/- 2pp (generous; GK at accuracy=10k is far tighter)
    lo_hi = {}
    for p in PROBS:
        lo = max(p - 0.02, 0.0)
        hi = min(p + 0.02, 1.0)
        row = percentile_summary(li, "l_extendedprice", (lo, hi)).collect()[0]
        lo_hi[p] = (row[0], row[1])
    for i, p in enumerate(PROBS):
        lo, hi = lo_hi[p]
        assert lo <= approx[i] <= hi, (p, approx[i], lo, hi)
        assert exact[i] == pytest.approx(approx[i], rel=0.05)
