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


# ---------------------------------------------------------------------------
# Misra-Gries mergeable top-k (r7): deterministic integer summaries,
# so unlike the HLL half these are EXACT-replayable — DuckDB replays
# partials and merge bit-for-bit.
# ---------------------------------------------------------------------------

def _mg_imports():
    from lakehouse_file_format_compare_spark.operators.sketches import (
        topk_partial_summaries,
        topk_rollup,
    )

    return topk_partial_summaries, topk_rollup


def test_topk_hand_values(spark):
    partial, rollup = _mg_imports()
    df = spark.createDataFrame(
        [("g1", v) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
        + [("g2", v) for v in ["a"] * 2 + ["e"] * 4],
        "grp string, item string",
    )
    p = {r["grp"]: r for r in partial(df, ["grp"], "item", k=2).collect()}
    g1 = p["g1"]
    assert [(i["rank"], i["item"], i["cnt"]) for i in g1["items"]] == [
        (1, "a", 5), (2, "b", 3)
    ]
    assert g1["bound"] == 2 and g1["n_rows"] == 11  # rank-3 cnt caps dropped
    assert p["g2"]["bound"] == 0                     # nothing dropped
    merged = rollup(partial(df, ["grp"], "item", k=2), [], k=2).collect()
    got = {(r["rank"], r["item"], r["lower_bound"]) for r in merged}
    assert got == {(1, "a", 7), (2, "e", 4)}
    assert all(r["bound_total"] == 2 and r["n_rows"] == 17 for r in merged)


def test_topk_heavy_hitter_guarantee(spark):
    """A value whose true coarse count exceeds bound_total must appear
    in the merged summary even when it is scattered thin: plant a
    hitter that ranks mid-pack in every group but dominates overall."""
    partial, rollup = _mg_imports()
    rows = []
    for g in range(10):
        rows += [(f"g{g}", "hot")] * 3                      # everywhere
        rows += [(f"g{g}", f"loc{g}_{j}") for j in range(4) for _ in (0, 1)]
    df = spark.createDataFrame(rows, "grp string, item string")
    merged = rollup(partial(df, ["grp"], "item", k=3), [], k=5).collect()
    by_item = {r["item"]: r for r in merged}
    assert "hot" in by_item
    hot = by_item["hot"]
    assert hot["lower_bound"] == 30        # kept in every partial -> exact
    assert hot["rank"] == 1
    assert 30 > hot["bound_total"] or hot["lower_bound"] >= 30  # non-vacuous


def test_topk_merge_invariant_to_partitioning(spark):
    partial, rollup = _mg_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderstatus", F.month("o_orderdate").alias("m"), "o_custkey"
    )
    a = rollup(partial(orders, ["o_orderstatus", "m"], "o_custkey", k=5),
               ["o_orderstatus"], k=5)
    b = rollup(
        partial(orders.repartition(13, "o_custkey"),
                ["o_orderstatus", "m"], "o_custkey", k=5).repartition(3),
        ["o_orderstatus"], k=5,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


MG_REPLAY_SQL = """
WITH c AS (
    SELECT o_orderstatus, month(o_orderdate) AS m, o_custkey, COUNT(*) AS cnt
    FROM read_parquet('{path}') GROUP BY ALL
), r AS (
    SELECT *, row_number() OVER (PARTITION BY o_orderstatus, m
                                 ORDER BY cnt DESC, o_custkey) AS rn
    FROM c
), kept AS (SELECT * FROM r WHERE rn <= 5),
bounds AS (
    SELECT o_orderstatus, m,
           COALESCE(MAX(CASE WHEN rn > 5 THEN cnt END), 0) AS bound,
           SUM(cnt) AS n_rows
    FROM r GROUP BY o_orderstatus, m
), merged AS (
    SELECT o_orderstatus, o_custkey, SUM(cnt) AS lb FROM kept GROUP BY ALL
), side AS (
    SELECT o_orderstatus, CAST(SUM(bound) AS BIGINT) AS bound_total,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows
    FROM bounds GROUP BY 1
), mr AS (
    SELECT o_orderstatus, o_custkey, CAST(lb AS BIGINT) AS lb,
           row_number() OVER (PARTITION BY o_orderstatus
                              ORDER BY lb DESC, o_custkey) AS rank
    FROM merged
)
SELECT m.o_orderstatus, rank, o_custkey AS item, lb AS lower_bound,
       bound_total, n_rows
FROM mr m JOIN side s USING (o_orderstatus)
WHERE rank <= 5
ORDER BY o_orderstatus, rank
"""


def test_topk_duckdb_replay(spark):
    partial, rollup = _mg_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderstatus", F.month("o_orderdate").alias("m"), "o_custkey"
    )
    got = sorted(map(tuple, rollup(
        partial(orders, ["o_orderstatus", "m"], "o_custkey", k=5),
        ["o_orderstatus"], k=5,
    ).select("o_orderstatus", "rank", "item", "lower_bound",
             "bound_total", "n_rows").collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(
        MG_REPLAY_SQL.format(path=os.path.join(SF_CORRECTNESS, "orders.parquet"))
    ).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_topk_empty_input(spark):
    partial, rollup = _mg_imports()
    empty = spark.createDataFrame([], "grp string, item string")
    assert partial(empty, ["grp"], "item").count() == 0
    assert rollup(partial(empty, ["grp"], "item"), ["grp"]).count() == 0


def test_topk_partials_survive_parquet_roundtrip(spark, tmp_path):
    """The persisted-table claim: partial summaries written to parquet
    and read back must roll up identically to the in-memory path (the
    whole point is persisting the fine grain once and merging from
    disk forever after)."""
    partial, rollup = _mg_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderstatus", F.month("o_orderdate").alias("m"), "o_custkey"
    )
    partials = partial(orders, ["o_orderstatus", "m"], "o_custkey", k=5)
    path = str(tmp_path / "topk_partials")
    partials.write.parquet(path)
    from_disk = rollup(spark.read.parquet(path), ["o_orderstatus"], k=5)
    in_mem = rollup(partials, ["o_orderstatus"], k=5)
    assert sorted(map(tuple, from_disk.collect())) == sorted(
        map(tuple, in_mem.collect())
    )
