"""Fixed-point PageRank (operators/pagerank.py): exact integer power
iteration, so every test compares BIT-EXACT values — against a
pure-Python reference implementation of the same update rule, hand
graphs, and structural invariants. The DuckDB replay of the full
pipeline is driver-visible via corpus_build_summary's pr_* columns
(plans/corpus_plans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.pagerank import UNIT, pagerank


def _py_pagerank(edges, iterations=6, dp=85, unit=UNIT):
    """Independent integer reference — same rule, plain dicts."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {v: 0 for v in nodes}
    for s, _ in edges:
        out[s] += 1
    n = len(nodes)
    r = {v: unit // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for s, d in edges:
            contrib[d] += r[s] // out[s]
        dang = sum(r[v] for v in nodes if out[v] == 0)
        r = {
            v: ((100 - dp) * unit) // (100 * n)
            + (dp * (contrib[v] + dang // n)) // 100
            for v in nodes
        }
    return r


def _spark_pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_matches_python_reference_on_hub_graph(spark):
    """Hub + chain + dangling + duplicate edge in one graph."""
    edges = (
        [(i, 0) for i in range(1, 8)]      # hub: everyone points at 0
        + [(0, 1), (1, 2), (2, 3)]         # chain
        + [(4, 5), (4, 5)]                 # duplicate edge (weight 2)
        # node 7 has an in-edge only via the hub fan -> 7 never listed
        # as src => dangling
    )
    got = _spark_pr(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    # mass concentrates along hub -> successor: node 1 receives the
    # ENTIRE hub mass (0's only out-edge), the hub itself is second
    ranking = sorted(got, key=lambda v: (-got[v], v))
    assert ranking[:2] == [1, 0]


def test_cycle_is_uniform_and_conserves_order(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got = _spark_pr(spark, edges)
    assert len(set(got.values())) == 1  # symmetry: all ranks equal


def test_all_dangling_graph_teleports_uniformly(spark):
    # only destinations exist as out-edge-free nodes after one hop:
    # a -> b, c -> b ; b dangling
    edges = [(1, 2), (3, 2)]
    got = _spark_pr(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    assert got[2] > got[1] == got[3]


def test_iterations_and_damping_validated(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)


def test_partitioning_invariance_exact(spark):
    """Integer arithmetic is the whole point: a reshuffled edge table
    must produce IDENTICAL ranks (the float formulation cannot make
    this promise — distributed double sums are order-dependent)."""
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, (i * 13 + 5) % 40) for i in range(40) if i % 3
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(13, "dst")).collect()
    }
    assert a == b


def test_corpus_link_graph_reference_equality(spark):
    """The synthetic documents link graph used by the driver row
    (plans/corpus_plans.py::_pr_edges): spark ranks == the python
    reference on the full sf0.001 corpus, and the planted hub (doc 0,
    linked by every i % 10 == 0 doc) outranks the uniform mass."""
    from lakehouse_file_format_compare_spark.plans.corpus_plans import _pr_edges
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    e_df = _pr_edges(docs)
    edges = [(r["src"], r["dst"]) for r in e_df.collect()]
    got = {r["node"]: r["rank"] for r in pagerank(e_df).collect()}
    want = _py_pagerank(edges)
    assert got == want
    n = len(want)
    assert got[0] > (UNIT // n) * 3  # the hub concentrates mass


def test_no_python_udfs_and_no_cartesian(spark):
    from lakehouse_file_format_compare_spark.plans.corpus_plans import _pr_edges
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    df = pagerank(_pr_edges(docs), iterations=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_no_global_window_in_operator_source():
    """r9 (r8 verdict #2): the dangling-mass total must be a broadcast
    driver scalar read off the persisted n-row aggregate, NEVER an
    empty-frame window — `Window.partitionBy()` is a single-partition
    pass over the FULL rank table repeated every iteration, a one-task
    funnel at web-graph node counts. Pin at source level because the
    eager localCheckpoint truncates the returned frame's plan (the
    per-iteration plans are no longer visible post-hoc)."""
    import inspect

    import lakehouse_file_format_compare_spark.operators.pagerank as m

    src = inspect.getsource(m)
    assert "Window.partitionBy" not in src
    assert "from pyspark.sql import Window" not in src
    assert ".over(" not in src


# --- HITS (r10) ---

def _py_hits(edges, iterations, scale=1_000_000):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    if n == 0:
        return {}
    h = {u: scale // n for u in nodes}

    def half(scores, fwd):
        raw = {u: 0 for u in nodes}
        for s, d in edges:
            if fwd:
                raw[d] += scores[s]
            else:
                raw[s] += scores[d]
        tot = sum(raw.values())
        if tot == 0:
            return {u: 0 for u in nodes}
        return {u: (raw[u] * scale) // tot for u in nodes}

    for _ in range(iterations):
        a = half(h, True)
        h = half(a, False)
    return {u: (a[u], h[u]) for u in nodes}


def test_hits_matches_pure_python_mirror(spark):
    from lakehouse_file_format_compare_spark.operators.pagerank import hits

    edges = [
        (1, 2), (1, 3), (4, 2), (4, 3), (5, 2),  # 2,3 authorities
        (2, 6), (3, 6),                           # 6 downstream
        (7, 7),                                   # self loop
        (1, 2),                                   # duplicate edge
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.authority, r.hub)
        for r in hits(df, iterations=4).collect()
    }
    assert got == _py_hits(edges, 4)
    # structure: node 2 is the top authority, node 1/4 are top hubs
    top_auth = max(got, key=lambda u: (got[u][0], -u))
    assert top_auth == 2
    assert got[1][1] >= got[5][1]  # two-link hub beats one-link hub


def test_hits_layout_invariance_on_citation_graph(spark):
    from lakehouse_file_format_compare_spark.operators.pagerank import hits
    from lakehouse_file_format_compare_spark.plans.corpus_plans import (
        _pr_edges,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    e = _pr_edges(docs)
    a = sorted(
        (r.node, r.authority, r.hub)
        for r in hits(e.repartition(1), iterations=3).collect()
    )
    b = sorted(
        (r.node, r.authority, r.hub)
        for r in hits(e.repartition(17, "dst"), iterations=3).collect()
    )
    assert a == b
    assert any(x[1] > 0 for x in a)


def test_hits_empty_and_degenerate(spark):
    from lakehouse_file_format_compare_spark.operators.pagerank import hits

    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty).count() == 0
    # single edge: src is the only hub, dst the only authority
    one = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: (r.authority, r.hub) for r in hits(one, iterations=2).collect()}
    assert got[2][0] == 1_000_000 and got[1][0] == 0
    assert got[1][1] == 1_000_000 and got[2][1] == 0
