"""Mergeable HLL rollups (operators/sketches.py): in the sparse
(coupon-exact) regime the merged coarse estimate EQUALS the direct
coarse-scan estimate — the events corpus (150 distinct users) pins
that here. In the dense regime the equality breaks (estimator-path
differences, see the module docstring; measured on sf0.01 orders),
so the general contracts are the relative-error envelope against
exact DuckDB distincts and the re-shuffled-layout estimate landing in
the SAME envelope — tolerance, never equality: r7 pinned strict
equality in the driver row and it failed at local[32] (register state
depends on per-partition insertion order). The envelope contracts are
re-run at local[2] and local[32] in tests/test_parallelism_sweep.py."""

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


# ---------------------------------------------------------------------------
# Count-Min frequency partials (r7 continuation): md5-derived buckets
# are engine-portable, so the full sketch — counters, merge, point
# estimates — replays EXACTLY in DuckDB (values, not envelopes).
# ---------------------------------------------------------------------------

def _cms_imports():
    from lakehouse_file_format_compare_spark.operators.sketches import (
        cms_estimates,
        cms_partial_counters,
        cms_rollup,
    )

    return cms_partial_counters, cms_rollup, cms_estimates


def test_cms_never_undercounts_and_heavy_key_tight(spark):
    """est >= truth for EVERY key (structural CMS guarantee), and on a
    corpus with few distinct keys vs width the heavy key is exact."""
    partial, rollup, estimate = _cms_imports()
    rows = [("g", "hot")] * 50 + [("g", f"k{i}") for i in range(20) for _ in range(2)]
    df = spark.createDataFrame(rows, "grp string, item string")
    counters = rollup(partial(df, ["grp"], "item", depth=3, width=64), ["grp"])
    keys = df.select("item").distinct()
    est = {
        r["item"]: r["cms_est"]
        for r in estimate(counters, ["grp"], keys, "item", depth=3, width=64).collect()
    }
    truth = {r["item"]: r["c"] for r in df.groupBy("item").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
    # 21 distinct keys into 64 buckets x depth 3: the hot key's min
    # row is collision-free with overwhelming odds for this fixed hash
    assert est["hot"] == 50


def test_cms_absent_key_estimates_bounded(spark):
    """A key never seen estimates >= 0 and <= the CMS error bound
    shape (some collision mass), and never crashes on missing
    counter rows (LEFT join + coalesce-0 path)."""
    partial, rollup, estimate = _cms_imports()
    df = spark.createDataFrame([("g", f"k{i}") for i in range(10)],
                               "grp string, item string")
    counters = rollup(partial(df, ["grp"], "item", depth=3, width=64), ["grp"])
    ghost = spark.createDataFrame([("zzz-never-seen",)], "item string")
    est = estimate(counters, ["grp"], ghost, "item", depth=3, width=64).collect()
    assert len(est) == 1 and 0 <= est[0]["cms_est"] <= 10


def test_cms_merge_equals_direct_and_partition_invariant(spark):
    """Merging (status, month) partials to status gives EXACTLY the
    counters a direct status-grain scan gives — CMS merge is lossless
    integer math — and is invariant to physical partitioning."""
    partial, rollup, _ = _cms_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderstatus", F.month("o_orderdate").alias("m"),
        F.col("o_custkey").cast("long").alias("cust"),
    )
    merged = rollup(partial(orders, ["o_orderstatus", "m"], "cust"), ["o_orderstatus"])
    direct = partial(orders, ["o_orderstatus"], "cust")
    shuffled = rollup(
        partial(orders.repartition(11, "cust"), ["o_orderstatus", "m"], "cust")
        .repartition(4),
        ["o_orderstatus"],
    )
    a = sorted(map(tuple, merged.collect()))
    assert a == sorted(map(tuple, direct.collect()))
    assert a == sorted(map(tuple, shuffled.collect()))


def test_cms_duckdb_replay(spark):
    """Bit-exact cross-engine replay of the merged counter grid."""
    partial, rollup, _ = _cms_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").select(
        "o_orderstatus", F.col("o_custkey").cast("long").alias("cust")
    )
    got = sorted(map(tuple, rollup(
        partial(orders, ["o_orderstatus"], "cust", depth=3, width=64),
        ["o_orderstatus"],
    ).collect()))
    con = duckdb.connect()
    path = os.path.join(SF_CORRECTNESS, "orders.parquet")
    want = sorted(map(tuple, con.execute(f"""
        SELECT o_orderstatus, d,
               CAST(('0x' || substr(md5(concat('cms', d, '|', CAST(o_custkey AS VARCHAR))), 1, 8)) AS BIGINT) % 64 AS bucket,
               COUNT(*) AS cnt
        FROM read_parquet('{path}')
        CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS d)
        GROUP BY ALL ORDER BY ALL
    """).fetchall()))
    con.close()
    assert len(got) > 100 and got == want


def test_cms_empty_input(spark):
    partial, rollup, estimate = _cms_imports()
    empty = spark.createDataFrame([], "grp string, item string")
    counters = rollup(partial(empty, ["grp"], "item"), ["grp"])
    assert counters.count() == 0
    keys = spark.createDataFrame([("x",)], "item string")
    assert estimate(counters, ["grp"], keys, "item").count() == 0


# ---------------------------------------------------------------------------
# Equi-width histogram quantile partials: merge is EXACTLY lossless
# (bin-wise integer sum), quantile bins are pure integer selection.
# ---------------------------------------------------------------------------

def _hist_imports():
    from lakehouse_file_format_compare_spark.operators.sketches import (
        histogram_partials,
        histogram_quantile_bins,
        histogram_rollup,
    )

    return histogram_partials, histogram_rollup, histogram_quantile_bins


def test_histogram_hand_values_and_clamping(spark):
    partial, rollup, qbins = _hist_imports()
    df = spark.createDataFrame(
        [("g", float(v)) for v in [-5, 0, 3, 9, 10, 19, 250]],
        "grp string, x double",
    )
    merged = {(r["bin"]): r["cnt"] for r in rollup(
        partial(df, ["grp"], "x", lo=0.0, bin_width=10.0, n_bins=4), ["grp"]
    ).collect()}
    # -5 clamps to bin 0; 250 clamps to bin 3; [0,3,9]->0, [10,19]->1
    assert merged == {0: 4, 1: 2, 3: 1}
    q = qbins(
        rollup(partial(df, ["grp"], "x", 0.0, 10.0, 4), ["grp"]),
        ["grp"], {"p50": 50, "p100": 100},
    ).collect()[0]
    assert q["p50_bin"] == 0 and q["p100_bin"] == 3 and q["n_rows"] == 7


def test_histogram_merge_equals_direct_and_quantile_brackets_exact(spark):
    """(status, month) partials merged to status == direct status
    histogram, bin-exact; and the p50/p95 bins bracket the exact
    percentile DuckDB computes (bracket = [lo+bin*w, lo+(bin+1)*w],
    closed right edge because interpolation can land on it)."""
    partial, rollup, qbins = _hist_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").withColumn(
        "m", F.month("o_orderdate")
    )
    merged = rollup(
        partial(orders, ["o_orderstatus", "m"], "o_totalprice", 0.0, 4096.0, 160),
        ["o_orderstatus"],
    )
    direct = partial(orders, ["o_orderstatus"], "o_totalprice", 0.0, 4096.0, 160)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    q = {r["o_orderstatus"]: r for r in qbins(
        merged, ["o_orderstatus"], {"p50": 50, "p95": 95}).collect()}
    con = duckdb.connect()
    path = os.path.join(SF_CORRECTNESS, "orders.parquet")
    exact = {s: (a, b) for s, a, b in con.execute(f"""
        SELECT o_orderstatus, quantile_disc(o_totalprice, 0.5),
               quantile_disc(o_totalprice, 0.95)
        FROM read_parquet('{path}') GROUP BY 1""").fetchall()}
    con.close()
    for s, (p50, p95) in exact.items():
        for name, val in (("p50", p50), ("p95", p95)):
            b = q[s][f"{name}_bin"]
            assert b * 4096.0 <= val <= (b + 1) * 4096.0, (s, name, b, val)


def test_histogram_partials_survive_parquet_roundtrip(spark, tmp_path):
    partial, rollup, _ = _hist_imports()
    orders = table(spark, SF_CORRECTNESS, "orders").withColumn(
        "m", F.month("o_orderdate")
    )
    partials = partial(orders, ["o_orderstatus", "m"], "o_totalprice",
                       0.0, 4096.0, 160)
    path = str(tmp_path / "hist_partials")
    partials.write.parquet(path)
    assert sorted(map(tuple, rollup(spark.read.parquet(path),
                                    ["o_orderstatus"]).collect())) == sorted(
        map(tuple, rollup(partials, ["o_orderstatus"]).collect()))


def test_histogram_empty_input(spark):
    partial, rollup, qbins = _hist_imports()
    empty = spark.createDataFrame([], "grp string, x double")
    merged = rollup(partial(empty, ["grp"], "x", 0.0, 1.0, 4), ["grp"])
    assert merged.count() == 0
    assert qbins(merged, ["grp"], {"p50": 50}).count() == 0
