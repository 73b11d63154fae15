"""Fuzzy edit-distance joins (operators/fuzzy.py): DuckDB levenshtein
value oracle for the exact baseline; blocked path must equal the
baseline exactly (recall 1.0 above the pigeonhole length bound,
precision 1.0 by verified-candidate design); plan + cap contracts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.fuzzy import (
    edit_distance_pairs,
    edit_distance_pairs_blocked,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

NAMES = [
    (1, "Acme Industrial Supply"),
    (2, "Acme Industrial Suply"),        # 1 deletion
    (3, "ACME industrial supply"),       # case only -> distance 0
    (4, "Acme Industrail Supply"),       # transposition -> distance 2
    (5, "Globex Corporation"),
    (6, "Globex Corporatiom"),           # 1 substitution
    (7, "Initech LLC"),
    (8, "Completely Different Name Co"),
]


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, "id long, name string").cache()


def test_exact_pairs_duckdb_oracle(spark, names_df):
    got = sorted(
        (r["id_a"], r["id_b"], r["distance"])
        for r in edit_distance_pairs(
            names_df, names_df, "id", "name", "id", "name", max_distance=2
        ).collect()
        if r["id_a"] < r["id_b"]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE n(id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO n VALUES (?, ?)", NAMES)
    want = sorted(map(tuple, con.execute("""
        SELECT a.id, b.id, levenshtein(lower(trim(a.name)), lower(trim(b.name))) AS d
        FROM n a JOIN n b ON a.id < b.id
        WHERE levenshtein(lower(trim(a.name)), lower(trim(b.name))) <= 2
    """).fetchall()))
    con.close()
    assert got == want
    pairs = {(a, b): d for a, b, d in got}
    assert pairs[(1, 3)] == 0 and pairs[(1, 2)] == 1 and pairs[(5, 6)] == 1
    assert pairs[(1, 4)] == 2
    assert not any(8 in p for p in pairs)


def test_blocked_equals_exact_above_length_bound(spark, names_df):
    """All fixture names exceed 2k+1 = 5 chars, so the bigram block
    is pigeonhole-exact: blocked output == brute force, distances
    included."""
    kw = dict(max_distance=2)
    exact = sorted(
        map(tuple, edit_distance_pairs(
            names_df, names_df, "id", "name", "id", "name", **kw).collect())
    )
    blocked = sorted(
        map(tuple, edit_distance_pairs_blocked(
            names_df, names_df, "id", "name", "id", "name", **kw).collect())
    )
    assert blocked == exact


def test_blocked_on_customer_names(spark):
    """Real-table run: customer names are near-identical TPC-H-style
    strings; blocked must match brute force exactly there too."""
    cust = table(spark, SF_CORRECTNESS, "customer").select("c_custkey", "c_name").limit(200)
    exact = sorted(map(tuple, edit_distance_pairs(
        cust, cust, "c_custkey", "c_name", "c_custkey", "c_name", max_distance=2
    ).collect()))
    blocked = sorted(map(tuple, edit_distance_pairs_blocked(
        cust, cust, "c_custkey", "c_name", "c_custkey", "c_name", max_distance=2
    ).collect()))
    assert blocked == exact
    assert len(exact) > 200  # TPC-H names differ only in digit tails -> many pairs


def test_blocked_plan_no_cartesian(spark, names_df):
    plan = (
        edit_distance_pairs_blocked(names_df, names_df, "id", "name", "id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_passjoin_equals_exact_on_fixture(spark, names_df):
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs_passjoin,
    )

    exact = sorted(map(tuple, edit_distance_pairs(
        names_df, names_df, "id", "name", "id", "name", max_distance=2).collect()))
    pj = sorted(map(tuple, edit_distance_pairs_passjoin(
        names_df, names_df, "id", "name", "id", "name", max_distance=2).collect()))
    assert pj == exact


def test_passjoin_exact_on_shared_prefix_corpus(spark):
    """Uniform 'Customer#…' prefixes at the measured-workable scale
    (~500 rows): PassJoin must equal brute force exactly. (Beyond
    that this corpus shape degenerates for ANY exact signature
    blocking — the constant prefix segment buckets the whole table;
    documented in operators/fuzzy.py.)"""
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs_passjoin,
    )

    cust = table(spark, SF_CORRECTNESS, "customer").select("c_custkey", "c_name").limit(500)
    exact = sorted(map(tuple, edit_distance_pairs(
        cust, cust, "c_custkey", "c_name", "c_custkey", "c_name", max_distance=2
    ).collect()))
    pj = sorted(map(tuple, edit_distance_pairs_passjoin(
        cust, cust, "c_custkey", "c_name", "c_custkey", "c_name", max_distance=2
    ).collect()))
    assert pj == exact
    assert len(exact) > 500


def test_passjoin_short_and_empty_strings(spark):
    """No length floor: strings of length <= k (where pigeonhole
    fails) and empty strings route through the exact short path."""
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs_passjoin,
    )

    rows = [(1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, "xy"), (6, "abcdef")]
    df = spark.createDataFrame(rows, "id long, name string")
    exact = sorted(map(tuple, edit_distance_pairs(
        df, df, "id", "name", "id", "name", max_distance=2).collect()))
    pj = sorted(map(tuple, edit_distance_pairs_passjoin(
        df, df, "id", "name", "id", "name", max_distance=2).collect()))
    assert pj == exact
    assert (1, 3, 2) in pj          # "" -> "ab" distance 2 found
