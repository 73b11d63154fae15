"""Winnowing fingerprints (operators/winnow.py, Schleimer 2003 /
MOSS): pure-Python mirror equivalence (hand fixtures + hypothesis
sweep), the paper's substring-match guarantee, the DuckDB oracle
replay of the driver-row scalars, empty/degenerate inputs, the
hot-bucket pair cap, and plan-shape pins (per-doc window only, no
Python, no Cartesian)."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.winnow import (
    HASH_HEX,
    winnow_fingerprints,
    winnow_scalars,
    winnow_shared_pairs,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def _mirror(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: the paper's algorithm verbatim — every
    window of w consecutive gram hashes selects its rightmost
    minimum. Returns {(pos_1based, hash)}."""
    n = re.sub(r"[^a-z0-9]", "", (text or "").lower())
    if len(n) < k:
        return set()
    grams = [n[i : i + k] for i in range(len(n) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:HASH_HEX], 16) for g in grams]
    out = set()
    for p in range(1, max(len(hs) - w + 1, 1) + 1):
        frame = hs[p - 1 : p - 1 + w]
        m = min(frame)
        q = max(i for i, h in enumerate(frame) if h == m) + p
        out.add((q, m))
    return out


_FIXTURE = [
    (1, "The quick brown fox jumps over the lazy dog!"),
    (2, "A quick brown fox; then something else entirely different."),
    (3, "tiny"),
    (4, "ab"),
    (5, None),
    (6, "aaaaaaaaaaaaaaaa"),  # all-equal hashes: rightmost-tie stress
    (7, "The quick brown fox jumps over the lazy dog!"),  # dup of 1
]


@pytest.mark.parametrize("k,w", [(5, 4), (3, 2), (4, 1), (1, 3)])
def test_matches_python_mirror_on_fixture(spark, k, w):
    docs = spark.createDataFrame(_FIXTURE, "doc_id long, text string")
    got = {(r.doc_id, r.pos, r.fp) for r in winnow_fingerprints(docs, k=k, w=w).collect()}
    want = {
        (did, q, h)
        for did, text in _FIXTURE
        if text is not None
        for q, h in _mirror(text, k, w)
    }
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet="abc THE5.\n", min_size=0, max_size=40
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=4),
    w=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_matches_python_mirror_swept(spark, texts, k, w):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r.doc_id, r.pos, r.fp) for r in winnow_fingerprints(docs, k=k, w=w).collect()}
    want = {
        (i, q, h) for i, t in enumerate(texts) for q, h in _mirror(t, k, w)
    }
    assert got == want


def test_substring_match_guarantee(spark):
    """The paper's theorem: a shared normalized substring of length
    >= w + k - 1 guarantees a shared fingerprint. Two otherwise
    unrelated docs share an 8-char run (k=5, w=4 -> t=8)."""
    k, w = 5, 4
    shared = "zqxjkvwm"  # 8 normalized chars = w + k - 1
    docs = spark.createDataFrame(
        [
            (1, f"left padding text {shared} and some tail"),
            (2, f"completely other words {shared} unrelated remainder"),
            (3, "nothing in common with either of those documents"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=k, w=w)
    pairs = {
        (r.doc_a, r.doc_b) for r in winnow_shared_pairs(fps).collect()
    }
    assert (1, 2) in pairs


def test_shared_pairs_counts_and_cap(spark):
    docs = spark.createDataFrame(
        [(i, "the very same boilerplate sentence body") for i in range(6)]
        + [(100, "an unrelated standalone document text")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs)
    pairs = winnow_shared_pairs(fps, min_shared=1, max_bucket=64)
    rows = {(r.doc_a, r.doc_b): r.shared_fps for r in pairs.collect()}
    # all 15 duplicate pairs found, none involving doc 100
    assert len(rows) == 15
    assert all(a < 100 and b < 100 for a, b in rows)
    n_fps_per_doc = fps.groupBy("doc_id").count().collect()[0]["count"]
    assert all(v == n_fps_per_doc for v in rows.values())
    # hot-bucket cap: every fp is shared by 6 docs, so max_bucket=5
    # drops every bucket and no pair survives
    assert winnow_shared_pairs(fps, max_bucket=5).count() == 0


def test_overlength_doc_raises_loudly(spark):
    """r10 advice: a normalized doc at/past POS_B = 2^22 chars would
    silently wrap positions into the hash bits — it must raise, not
    fingerprint wrongly; a doc just under the limit must pass."""
    import pytest

    from lakehouse_file_format_compare_spark.operators.winnow import (
        POS_B,
        winnow_fingerprints,
    )

    too_long = spark.sql(
        f"SELECT CAST(1 AS BIGINT) AS doc_id, repeat('a', {POS_B}) AS text"
    )
    with pytest.raises(Exception, match="winnow_fingerprints.*chunk upstream"):
        winnow_fingerprints(too_long, k=5, w=4).count()

    # pass side: a large-but-legal doc fingerprints fine (the full
    # POS_B-1 boundary doc would grind 4M grams through the per-doc
    # window — the guard expression `length >= POS_B` carries the
    # boundary)
    legal = spark.sql(
        "SELECT CAST(1 AS BIGINT) AS doc_id, repeat('ab', 25000) AS text"
    )
    assert winnow_fingerprints(legal, k=5, w=4).count() >= 1


def test_empty_and_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert winnow_fingerprints(empty).count() == 0
    row = winnow_scalars(empty).collect()[0].asDict()
    assert row == {
        "wf_selected": 0,
        "wf_distinct_fps": 0,
        "wf_docs": 0,
        "wf_total_grams": 0,
        "wf_density_nanos": 0,
        "wf_shared_pairs": 0,
        "wf_top_pair_shared": 0,
    }
    # docs that normalize below k chars contribute nothing but count
    # zero grams (not negative)
    shorties = spark.createDataFrame(
        [(1, "a!"), (2, "   "), (3, None)], "doc_id long, text string"
    )
    srow = winnow_scalars(shorties).collect()[0].asDict()
    assert srow["wf_selected"] == 0 and srow["wf_total_grams"] == 0


def test_scalars_match_duckdb_replay(spark, tmp_path):
    """The driver-row oracle fragment (plans/text_plans.py::
    _winnow_duck_ctes) replays the full selection bit-exactly on the
    real documents table."""
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        WINNOW_K,
        WINNOW_W,
        _winnow_duck_ctes,
    )

    docs = table(spark, SF_SMOKE, "documents")
    srow = winnow_scalars(docs, k=WINNOW_K, w=WINNOW_W).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    res = con.execute(f"WITH {_winnow_duck_ctes()} SELECT * FROM wf")
    drow = dict(zip([d[0] for d in res.description], res.fetchone()))
    con.close()
    assert srow == drow
    # density sits near the paper's 2/(w+1) expectation
    assert abs(srow["wf_density_nanos"] / 1e9 - 2 / (WINNOW_W + 1)) < 0.05


def test_plan_shape(spark):
    """No Python evaluation, no Cartesian product, and the selection
    window runs per-document — never on a single partition."""
    docs = table(spark, SF_SMOKE, "documents")
    for df in [
        winnow_fingerprints(docs),
        winnow_shared_pairs(winnow_fingerprints(docs)),
        winnow_scalars(docs),
    ]:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
    fp_plan = winnow_fingerprints(docs)._sc._jvm.PythonSQLUtils.explainString(
        winnow_fingerprints(docs)._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in fp_plan
    assert "doc_id" in fp_plan  # the window's partition key


def test_selection_is_layout_invariant(spark):
    """Exact integers + per-doc windows: the selected set is identical
    under different partition layouts."""
    docs = table(spark, SF_SMOKE, "documents")
    base = {(r.doc_id, r.pos, r.fp) for r in winnow_fingerprints(docs).collect()}
    shuffled = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(docs.repartition(17, "source")).collect()
    }
    assert base == shuffled


def test_winnow_pairs_feed_connected_components(spark):
    """Cross-family integration: winnow shared pairs drive the same
    connected-components canonicalization the MinHash path uses —
    planted substring-sharing docs collapse into one component."""
    from lakehouse_file_format_compare_spark.operators.components import (
        connected_components,
    )

    # a long shared run: every interior window selects the same
    # fingerprints, so well over min_shared=2 survive any boundary
    # context differences
    shared = "zq xj kv wm pf gb qz jx vk mw fp bg zq xj kv"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"delta {shared} epsilon zeta"),
            (3, f"eta theta iota {shared}"),
            # no 5-gram in common with anything else (the first cut of
            # this fixture gave both docs the word "unrelated" — nine
            # normalized chars, over the t=8 guarantee — and the
            # detector correctly paired them)
            (10, "oak elm fir yew ash"),
            (11, "red blue green cyan pink"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_shared_pairs(winnow_fingerprints(docs), min_shared=2)
    comp = {
        r.node: r.component
        for r in connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3]
    assert 10 not in comp and 11 not in comp
