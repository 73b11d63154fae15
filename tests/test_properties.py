"""Property-based tests (hypothesis) for the merge operator — the
engine's most semantics-critical primitive (SURVEY §7.3 'merge
semantics parity' risk): idempotency, key uniqueness, policy
invariants over arbitrary key/timestamp collision patterns."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.merge import keep_latest, merge

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),    # key (dense → collisions)
    st.integers(min_value=0, max_value=100),  # version/timestamp
    st.integers(min_value=-10, max_value=10), # payload
)
ROWS = st.lists(ROW, min_size=0, max_size=12)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0, 0)], "k long, v long, p long").where(
        F.lit(bool(rows))
    )


@given(target=ROWS, staging=ROWS)
@settings(**_SETTINGS)
def test_upsert_properties(spark, target, staging):
    t = _df(spark, target)
    s = keep_latest(_df(spark, staging), ["k"], ["v", "p"])
    merged = merge(t, s, keys=["k"], policy="upsert")
    got = {r["k"]: (r["v"], r["p"]) for r in merged.collect()}

    t_map = {}
    for k, v, p in target:
        t_map[k] = None  # presence only; duplicates in target stay as-is
    s_map = {}
    for k, v, p in staging:
        if k not in s_map or (v, p) > s_map[k]:
            s_map[k] = (v, p)

    # staging rows win on collision; target-only keys survive
    for k, vp in s_map.items():
        assert got[k] == vp
    assert set(got) == set(t_map) | set(s_map)
    # idempotency: re-merging the same staging changes nothing
    again = merge(merged, s, keys=["k"], policy="upsert")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


@given(target=ROWS, staging=ROWS)
@settings(**_SETTINGS)
def test_insert_only_properties(spark, target, staging):
    t = keep_latest(_df(spark, target), ["k"], ["v", "p"])
    s = keep_latest(_df(spark, staging), ["k"], ["v", "p"])
    merged = merge(t, s, keys=["k"], policy="insert_only")
    got = {r["k"]: (r["v"], r["p"]) for r in merged.collect()}
    t_map = {r["k"]: (r["v"], r["p"]) for r in t.collect()}
    s_map = {r["k"]: (r["v"], r["p"]) for r in s.collect()}
    # existing keys untouched, new keys inserted
    for k, vp in t_map.items():
        assert got[k] == vp
    for k, vp in s_map.items():
        if k not in t_map:
            assert got[k] == vp
    assert set(got) == set(t_map) | set(s_map)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_keep_latest_properties(spark, rows):
    out = keep_latest(_df(spark, rows), ["k"], ["v", "p"]).collect()
    got = {r["k"]: (r["v"], r["p"]) for r in out}
    assert len(out) == len(got), "keep_latest left duplicate keys"
    want = {}
    for k, v, p in rows:
        if k not in want or (v, p) > want[k]:
            want[k] = (v, p)
    assert got == want
