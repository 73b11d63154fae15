"""Data profiling operators (operators/profiling.py): per-column
table profile and per-key skew report, both replayed exactly in
DuckDB on the sf0.01 orders table — plus plan pins (one scan, no
Python, TakeOrderedAndProject for the heavy keys) and the
approx/exact dials."""

from __future__ import annotations

import duckdb
import os

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.profiling import (
    key_skew_report,
    profile_table,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

ORDERS = os.path.join(SF_CORRECTNESS, "orders.parquet")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_profile_matches_duckdb_exactly(spark):
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    orders = table(spark, SF_CORRECTNESS, "orders")
    got = sorted(
        map(tuple, profile_table(orders, cols).collect())
    )
    con = duckdb.connect()
    parts = []
    for c in cols:
        num = c != "o_orderstatus"
        parts.append(f"""
            SELECT '{c}' AS column, COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({c}) AS n_nulls,
                   COUNT(DISTINCT {c}) AS n_distinct,
                   {f"floor(CAST(MIN({c}) AS DOUBLE) * 100 + 0.5) / 100" if num else "NULL"} AS min_num,
                   {f"floor(CAST(MAX({c}) AS DOUBLE) * 100 + 0.5) / 100" if num else "NULL"} AS max_num,
                   {f"floor(AVG(CAST({c} AS DOUBLE)) * 100 + 0.5) / 100" if num else "NULL"} AS mean_num,
                   {"NULL" if num else f"CAST(MIN({c}) AS VARCHAR)"} AS min_str,
                   {"NULL" if num else f"CAST(MAX({c}) AS VARCHAR)"} AS max_str
            FROM read_parquet('{ORDERS}')""")
    want = sorted(map(tuple, con.execute(" UNION ALL ".join(parts)).fetchall()))
    con.close()
    assert got == want


def test_profile_single_scan_no_python(spark):
    orders = table(spark, SF_CORRECTNESS, "orders")
    df = profile_table(orders, ["o_orderkey", "o_orderstatus"])
    plan = _plan(df)
    # formatted explain prints each node twice (tree + detail); count
    # scan DEFINITIONS via their Location lines
    assert plan.count("Location:") <= 1, "profile re-scans the table"
    assert "BatchEvalPython" not in plan


def test_profile_approx_within_envelope_no_expand(spark):
    """approx=True: HLL distinct within 5% of exact, and the plan
    loses the Expand node the exact multi-distinct requires — the
    100 TB shape."""
    orders = table(spark, SF_CORRECTNESS, "orders")
    cols = ["o_custkey", "o_orderstatus"]
    exact = {r["column"]: r["n_distinct"]
             for r in profile_table(orders, cols).collect()}
    approx_df = profile_table(orders, cols, approx=True)
    approx = {r["column"]: r["n_distinct"] for r in approx_df.collect()}
    # rsd=0.02 -> 10% envelope is 5 sigma (the op_approx_distinct
    # margin lesson from r8: never pin a sketch at ~2 sigma)
    for c in cols:
        assert abs(approx[c] - exact[c]) <= max(1, 0.10 * exact[c]), c
    assert "Expand" not in _plan(approx_df)
    assert "Expand" in _plan(profile_table(orders, cols))


def test_profile_validates_columns(spark):
    orders = table(spark, SF_CORRECTNESS, "orders")
    with pytest.raises(ValueError):
        profile_table(orders, ["nope"])
    with pytest.raises(ValueError):
        profile_table(orders, [])


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (None, None)],
        "k long, s string",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 2
    assert rows["k"]["n_distinct"] == 2
    assert rows["s"]["n_nulls"] == 2 and rows["s"]["min_str"] == "a"
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0


def test_skew_report_matches_duckdb_exactly(spark):
    orders = table(spark, SF_CORRECTNESS, "orders")
    got = [tuple(r) for r in key_skew_report(
        orders, ["o_custkey"], top_k=5).collect()]
    con = duckdb.connect()
    want = con.execute(f"""
        WITH c AS (
            SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS cnt
            FROM read_parquet('{ORDERS}') GROUP BY 1
        ), top AS (
            SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key) AS rn
            FROM c ORDER BY cnt DESC, key LIMIT 5
        ), t AS (
            SELECT MAX(CASE WHEN rn = 1 THEN key END) AS top1_key,
                   MAX(CASE WHEN rn = 1 THEN cnt END) AS top1_count,
                   CAST(SUM(rn * cnt) AS BIGINT) AS topk_fp
            FROM top
        ), s AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_keys,
                   MAX(cnt) AS max_count,
                   floor(AVG(cnt) * 10000 + 0.5) / 10000 AS avg_count,
                   floor(quantile_cont(cnt, 0.5) * 10000 + 0.5) / 10000 AS p50_count,
                   floor(quantile_cont(cnt, 0.99) * 10000 + 0.5) / 10000 AS p99_count
            FROM c
        )
        SELECT s.*, t.*,
               floor(CAST(max_count AS DOUBLE) / avg_count * 10000 + 0.5) / 10000
                   AS skew_ratio
        FROM s, t
    """).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]


def test_skew_report_plan_and_dials(spark):
    orders = table(spark, SF_CORRECTNESS, "orders")
    df = key_skew_report(orders, ["o_custkey"], top_k=3)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, "heavy keys must not global-sort"
    assert "BatchEvalPython" not in plan
    # approx percentiles: sane (between min and max of exact) — the
    # bounded-memory path for billion-key spaces
    exact = key_skew_report(orders, ["o_custkey"]).first()
    approx = key_skew_report(
        orders, ["o_custkey"], exact_percentiles=False
    ).first()
    assert approx["n_keys"] == exact["n_keys"]
    assert 1 <= approx["p50_count"] <= exact["max_count"]
    with pytest.raises(ValueError):
        key_skew_report(orders, [])
    with pytest.raises(ValueError):
        key_skew_report(orders, ["o_custkey"], top_k=0)


def test_skew_report_flags_planted_hot_key(spark):
    """A key owning half the rows must dominate the report: top1 is
    the planted key and skew_ratio explodes while p50 stays flat."""
    base = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(777))
        .otherwise(F.col("id")).alias("k")
    )
    r = key_skew_report(base, ["k"]).first()
    assert r["top1_key"] == "777"
    # 5000 evens remapped + id 777 itself (odd, keeps its value)
    assert r["top1_count"] == 5_001
    assert r["max_count"] == 5_001
    assert r["skew_ratio"] > 1_000
    assert r["p50_count"] == 1.0


def test_exact_quantiles_match_sorted_mirror(spark):
    """Exact order statistics vs a sorted-list mirror: random values
    (wide range + heavy ties), every basis point incl. p100, empty
    input."""
    import random

    from lakehouse_file_format_compare_spark.operators.profiling import (
        exact_quantiles,
    )

    bps = (1, 2500, 5000, 9500, 9900, 10000)

    def mirror(vals):
        n = len(vals)
        if n == 0:
            return (0,) + (0,) * len(bps)
        s = sorted(vals)
        return (n,) + tuple(s[(n * bp + 9999) // 10000 - 1] for bp in bps)

    rng = random.Random(29)
    for _ in range(4):
        n = rng.randint(1, 150)
        vals = [
            rng.randint(-(10**12), 10**12)
            if rng.random() < 0.5
            else rng.randint(-3, 3)
            for _ in range(n)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = tuple(exact_quantiles(df, "x", bps).collect()[0])
        assert got == mirror(vals), (vals, got)
    empty = spark.createDataFrame([], "x long")
    assert tuple(exact_quantiles(empty, "x", bps).collect()[0]) == (0,) * 7


def test_exact_quantiles_layout_and_bucket_invariant(spark):
    from lakehouse_file_format_compare_spark.operators.profiling import (
        exact_quantiles,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table
    from pyspark.sql import functions as F

    cents = table(spark, SF_CORRECTNESS, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    a = tuple(exact_quantiles(cents, "v").collect()[0])
    b = tuple(exact_quantiles(cents.repartition(13), "v").collect()[0])
    c = tuple(exact_quantiles(cents, "v", bucket_shift=8).collect()[0])
    d = tuple(exact_quantiles(cents, "v", bucket_shift=62).collect()[0])
    assert a == b == c == d


def test_exact_quantiles_plan_shape(spark):
    from lakehouse_file_format_compare_spark.operators.profiling import (
        exact_quantiles,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table
    from pyspark.sql import functions as F

    cents = table(spark, SF_CORRECTNESS, "orders").select(
        F.col("o_orderkey").cast("long").alias("v")
    )
    frame = exact_quantiles(cents, "v")
    plan = frame._sc._jvm.PythonSQLUtils.explainString(
        frame._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_grouped_exact_quantiles_match_per_group_filter(spark):
    """grouped_exact_quantiles row-for-row equals exact_quantiles run
    on each group slice (singleton groups included) and its plan has
    no globally-ordered window."""
    import random

    from lakehouse_file_format_compare_spark.operators.profiling import (
        exact_quantiles,
        grouped_exact_quantiles,
    )
    from pyspark.sql import functions as F

    rng = random.Random(41)
    rows = [
        (f"g{rng.randint(0, 4)}", rng.randint(-100, 100)) for _ in range(400)
    ] + [("solo", 7)]
    df = spark.createDataFrame(rows, "source string, v long")
    got = {
        r.source: (r.n, r.q5000, r.q9500)
        for r in grouped_exact_quantiles(df, ["source"], "v").collect()
    }
    assert len(got) == 6
    for src in got:
        ref = exact_quantiles(
            df.where(F.col("source") == src), "v", (5000, 9500)
        ).collect()[0]
        assert got[src] == (ref.n, ref.q5000, ref.q9500), src
    frame = grouped_exact_quantiles(df, ["source"], "v")
    plan = frame._sc._jvm.PythonSQLUtils.explainString(
        frame._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan
