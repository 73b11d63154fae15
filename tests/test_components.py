"""Connected components (operators/components.py): alternating-star
correctness vs a pure-Python union-find on seeded random graphs, plus
the canonicalize contract."""

from __future__ import annotations

import random

import pytest

from lakehouse_file_format_compare_spark.operators.components import (
    canonicalize,
    connected_components,
)


def _union_find_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_components_simple_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: worst case for label
    # propagation, trivial for alternating-star
    got = _spark_components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_duplicate_and_reversed_edges(spark):
    got = _spark_components(spark, [(5, 9), (9, 5), (5, 9), (7, 7)])
    # self-loop contributes its node; duplicates collapse
    assert got == {5: 5, 9: 5, 7: 7}


@pytest.mark.parametrize("seed", [0, 1])
def test_components_random_vs_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    want = _union_find_components(edges, {n for e in edges for n in e})
    got = _spark_components(spark, edges)
    assert got == want


def test_canonicalize_keeps_unpaired_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a long, doc_b long")
    out = {r["doc_id"]: (r["canonical_id"], r["is_canonical"]) for r in canonicalize(docs, pairs).collect()}
    assert out == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (0, False),
        4: (4, True),
        5: (0, False),
    }
    # the dedup contract: keeping is_canonical rows keeps one doc per cluster
    kept = [d for d, (_, keep) in out.items() if keep]
    assert sorted(kept) == [0, 1, 2, 4]


def test_resolve_duplicates_keeps_best_scoring(spark):
    """Quality-aware resolution: within each cluster exactly one keeper
    — the max-score doc (ties to the smaller id); singletons keep
    themselves; cluster membership matches connected components."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.components import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, "x", 0.2), (2, "x", 0.9), (3, "x", 0.9),   # cluster {1,2,3}: 2 wins (tie 2<3)
         (4, "y", 0.5), (5, "y", 0.1),                  # cluster {4,5}: 4 wins
         (6, "z", 0.0)],                                # singleton
        "doc_id long, text string, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long")
    out = resolve_duplicates(docs, pairs, score=F.col("q"))
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert rows[1][0] == rows[2][0] == rows[3][0]
    assert rows[4][0] == rows[5][0] != rows[1][0]
    keepers = {d for d, (_, k) in rows.items() if k}
    assert keepers == {2, 4, 6}
    # default score path (quality_score over text) runs end-to-end
    out2 = resolve_duplicates(docs, pairs)
    assert sum(1 for r in out2.collect() if r["keep"]) == 3


def test_resolve_duplicates_string_ids(spark):
    """Type-agnostic tie-break (r5 advice): string doc ids must work —
    the former -id argmax assumed numeric ids and errored under ANSI
    mode. Ties on score break to the lexically smaller id."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.components import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [("a1", 0.2), ("a2", 0.9), ("a3", 0.9),   # cluster: a2 wins (tie a2 < a3)
         ("b1", 0.5), ("b2", 0.7),                # cluster: b2 wins
         ("c1", 0.0)],                            # singleton
        "doc_id string, q double",
    )
    pairs = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("b1", "b2")], "doc_a string, doc_b string"
    )
    out = resolve_duplicates(docs, pairs, score=F.col("q"))
    keepers = {r["doc_id"] for r in out.collect() if r["keep"]}
    assert keepers == {"a2", "b2", "c1"}


def test_resolve_duplicates_null_score_loses(spark):
    """A NULL score must never win its cluster (struct comparison
    sorts a null first field smallest, which a bare min_by(-score)
    would turn into a win for exactly the corrupt doc the operator
    exists to discard)."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.components import (
        resolve_duplicates,
    )

    docs = spark.createDataFrame(
        [(1, 0.9), (2, None), (3, 0.5),   # cluster {1,2,3}: 1 wins, not null-scored 2
         (4, None), (5, None)],           # all-null cluster: smaller id wins
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long")
    out = resolve_duplicates(docs, pairs, score=F.col("q"))
    keepers = {r["doc_id"] for r in out.collect() if r["keep"]}
    assert keepers == {1, 4}


def test_resolve_duplicates_on_corpus(spark):
    """On the real corpus near-dup graph: exactly one keeper per
    cluster, total keepers == number of clusters + singletons."""
    import lakehouse_file_format_compare_spark.operators.dedup as D
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.components import (
        resolve_duplicates,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    docs = table(spark, SF_CORRECTNESS, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    out = resolve_duplicates(docs, pairs).cache()
    assert out.count() == docs.count()
    per_cluster = out.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("keepers")
    )
    assert per_cluster.where(F.col("keepers") != 1).count() == 0
    out.unpersist()


def test_canonicalize_result_plan_never_reruns_the_pair_plan(spark):
    """Regression pin for the r10 single-evaluation fix: the
    canonicalize RESULT plan must read the pair set from the
    checkpointed edge materializations (Scan ExistingRDD), never by
    re-running the caller's pair plan — before the fix, the node
    universe re-ran the full MinHash subtree (shingle explodes +
    xxhash64 signatures) a second time at result time."""
    from lakehouse_file_format_compare_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out = canonicalize(docs, minhash_lsh_pairs(docs, threshold=0.5))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Scan ExistingRDD") >= 2  # edges + star forest
    assert "xxhash64" not in plan  # no signature recomputation
    assert plan.count("Generate") == 0  # no shingle explode either


# --- triangle_stats (r10) ---

def _tri(spark, edges):
    from lakehouse_file_format_compare_spark.operators.components import (
        triangle_stats,
    )

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return triangle_stats(df).collect()[0]


def _naive_triangles(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in es for n in e})
    t = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    t += 1
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    w = sum(d * (d - 1) // 2 for d in deg.values())
    return len(es), t, w


def test_triangle_stats_hand_graphs(spark):
    # single triangle
    r = _tri(spark, [(1, 2), (2, 3), (3, 1)])
    assert (r.tri_edges, r.tri_triangles, r.tri_wedges) == (3, 1, 3)
    assert r.tri_gcc_grid == 1_000_000
    # path: no triangle, one wedge
    r = _tri(spark, [(1, 2), (2, 3)])
    assert (r.tri_triangles, r.tri_wedges, r.tri_gcc_grid) == (0, 1, 0)
    # K4: 4 triangles, 12 wedges, gcc 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4)
    assert (r.tri_edges, r.tri_triangles, r.tri_wedges) == (6, 4, 12)
    assert r.tri_gcc_grid == 1_000_000
    # star: hub wedges, no closure; duplicate + reversed edges dedup
    star = [(0, i) for i in range(1, 6)] + [(3, 0), (0, 4)]
    r = _tri(spark, star)
    assert (r.tri_edges, r.tri_triangles, r.tri_wedges) == (5, 0, 10)
    # empty graph
    r = _tri(spark, [(7, 7)])
    assert (r.tri_edges, r.tri_triangles, r.tri_wedges,
            r.tri_gcc_grid) == (0, 0, 0, 0)


def test_triangle_stats_matches_naive_on_pseudorandom_graphs(spark):
    """The degree-oriented count equals the naive enumeration on
    hub-heavy pseudo-random graphs (hub nodes exercise orientation;
    multiplicative-hash edges are reproducible)."""
    for seed, n, m in [(1, 12, 30), (2, 20, 60), (3, 9, 36)]:
        s = seed
        edges = []
        for _ in range(m):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            a = s % n
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            b = s % n
            edges.append((a, b))
        # add a hub touching everyone (degree-orientation stress)
        edges += [(0, i) for i in range(n)]
        want = _naive_triangles(edges)
        r = _tri(spark, edges)
        assert (r.tri_edges, r.tri_triangles, r.tri_wedges) == want, seed


def test_triangle_plan_has_no_cartesian(spark):
    from lakehouse_file_format_compare_spark.operators.components import (
        triangle_stats,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "doc_a long, doc_b long"
    )
    plan = (
        triangle_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# --- label_propagation (r10) ---

def _py_lpa(edges, iterations):
    sym = set()
    for a, b in edges:
        if a != b:
            sym.add((a, b)); sym.add((b, a))
    nodes = sorted({u for u, _ in sym})
    label = {u: u for u in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            cnt = {}
            for u, w in sym:
                if w == v:
                    cnt[label[u]] = cnt.get(label[u], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        label = nxt
    return label


def test_lpa_matches_pure_python_and_splits_cliques(spark):
    from lakehouse_file_format_compare_spark.operators.components import (
        label_propagation,
    )

    # two 4-cliques joined by one bridge edge: one CC, two communities
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = cl1 + cl2 + [(3, 10)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.community
        for r in label_propagation(df, iterations=4).collect()
    }
    assert got == _py_lpa(edges, 4)
    comm = {}
    for n, c in got.items():
        comm.setdefault(c, set()).add(n)
    groups = sorted(tuple(sorted(g)) for g in comm.values())
    assert groups == [(0, 1, 2, 3), (10, 11, 12, 13)]


def _py_coreness(edges):
    """Classic peel: repeatedly remove the minimum-degree node; its
    core number is the running maximum of removal degrees."""
    adj: dict = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    core = {}
    remaining = set(adj)
    k = 0
    while remaining:
        n = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[n])
        core[n] = k
        remaining.remove(n)
        for m in adj[n]:
            if m in remaining:
                deg[m] -= 1
    return core


def test_kcore_converges_to_peel_coreness(spark):
    """Iterated H-index at a convergence-sized round count equals the
    exact peel core number (Lü et al. 2016 Theorem 1) on pseudorandom
    graphs and on the clique-plus-chain hand case."""
    import random

    from lakehouse_file_format_compare_spark.operators.components import kcore

    rng = random.Random(7)
    for _ in range(3):
        edges = set()
        for _ in range(40):
            a, b = rng.sample(range(20), 2)
            edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.node: r.core for r in kcore(df, iterations=30).collect()}
        assert got == _py_coreness(edges)

    # 5-clique (core 4) with a pendant chain (core 1)
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
        (4, 100), (100, 101), (101, 102)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.core for r in kcore(df, iterations=30).collect()}
    assert got == _py_coreness(edges)
    assert got[0] == 4 and got[102] == 1


def test_kcore_fixed_rounds_layout_invariance(spark):
    """The driver row runs a FIXED round count; the fixed-round value
    must be identical under any input partitioning (the H-index of a
    multiset is order-invariant)."""
    from lakehouse_file_format_compare_spark.operators.components import kcore
    from lakehouse_file_format_compare_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "doc_a", "doc_b"
    ).localCheckpoint()
    a = sorted(
        (r.node, r.core)
        for r in kcore(pairs.repartition(1), 3).collect()
    )
    b = sorted(
        (r.node, r.core)
        for r in kcore(pairs.repartition(9, "doc_b"), 3).collect()
    )
    assert a == b and len(a) > 0


def test_lpa_layout_invariance(spark):
    from lakehouse_file_format_compare_spark.operators.components import (
        label_propagation,
    )
    from lakehouse_file_format_compare_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
        "doc_a", "doc_b"
    ).localCheckpoint()
    a = sorted(
        (r.node, r.community)
        for r in label_propagation(pairs.repartition(1), 3).collect()
    )
    b = sorted(
        (r.node, r.community)
        for r in label_propagation(pairs.repartition(9, "doc_b"), 3).collect()
    )
    assert a == b and len(a) > 0


def test_resolve_duplicates_with_lm_quality_score(spark):
    """Cross-family integration: duplicate resolution driven by the
    bigram-LM quality score — within a near-dup cluster the
    LOWER-perplexity copy (higher lp_nanos per bigram) wins, not the
    min-id one. Composes operators/lm.py scoring into
    resolve_duplicates' score hook; the clean copy is deliberately
    given the larger doc_id so min-id canonicalization would pick the
    mojibake copy."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.components import (
        resolve_duplicates,
    )
    from lakehouse_file_format_compare_spark.operators.lm import (
        bigram_lm_score,
        bigram_lm_train,
    )

    clean = "the data table holds the value rows"
    noisy = "the data zzqx qqzz the value xx"
    docs = spark.createDataFrame(
        [(1, noisy, "en"), (2, clean, "en"), (3, "other doc", "en")],
        "doc_id long, text string, lang string",
    )
    model, ctx, vocab = bigram_lm_train(docs.where(F.col("doc_id") == 2))
    scored = bigram_lm_score(docs, model, ctx, vocab)
    # per-token exact LM quality: lp_nanos / n_bigrams via an integer-
    # safe double (score column may be any numeric expression)
    quality = docs.join(scored, "doc_id").withColumn(
        "__q",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("lp_nanos").cast("double") / F.col("n_bigrams"),
        ).otherwise(F.lit(float("-inf"))),
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    kept = {
        r.doc_id: r.keep
        for r in resolve_duplicates(
            quality, pairs, score=F.col("__q")
        ).collect()
    }
    assert kept == {1: False, 2: True, 3: True}
