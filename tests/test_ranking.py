"""BM25 / TF-IDF (operators/ranking.py): exact DuckDB oracle on the
documents table (same tokenization + double math, 1e-6 grid), plus
hand-checkable values on a tiny fixture and a plan-shape pin
(term-stats joins must broadcast; no cartesian on the corpus side)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.ranking import (
    bm25_scores,
    tfidf_scores,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

TERMS = ["data", "system", "the"]
K1, B = 1.2, 0.75


def _bm25_sql(path: str, terms: list[str], k1: float, b: float) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM read_parquet('{path}')
), dt AS (
    SELECT doc_id, len(t) AS doc_len, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, doc_len, term, COUNT(*) AS tf FROM dt GROUP BY ALL
), corpus AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs,
           SUM(tf) / COUNT(DISTINCT doc_id) AS avg_len
    FROM tf
), dfs AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
    WHERE term IN ({tl}) GROUP BY term
)
SELECT tf.doc_id,
       FLOOR(SUM(
           ln(1.0 + (c.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * tf.doc_len / c.avg_len))
       ) * 1000000 + 0.5) / 1000000 AS bm25,
       COUNT(*) AS n_terms_matched
FROM tf JOIN dfs USING (term) CROSS JOIN corpus c
WHERE tf.term IN ({tl})
GROUP BY tf.doc_id
"""


def test_bm25_oracle_on_documents(spark):
    import os

    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    got = sorted(
        map(tuple, bm25_scores(table(spark, SF_CORRECTNESS, "documents"),
                               TERMS, k1=K1, b=B).collect())
    )
    assert len(got) > 0  # terms chosen to hit the synthetic corpus
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(_bm25_sql(path, TERMS, K1, B)).fetchall()))
    con.close()
    assert len(got) == len(want)
    for (gd, gs, gn), (wd, ws, wn) in zip(got, want):
        assert (gd, gn) == (wd, wn)
        assert gs == pytest.approx(ws, abs=2e-6)


def test_bm25_hand_values(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bm25_scores(docs, ["apple"], k1=K1, b=B).collect()}
    assert set(rows) == {1}                 # only doc 1 matches
    import math

    idf = math.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    tfn = 2 * (K1 + 1) / (2 + K1 * (1 - B + B * 3 / 2))  # tf=2, len=3, avg=2
    assert rows[1]["bm25"] == pytest.approx(idf * tfn, abs=2e-6)
    assert rows[1]["n_terms_matched"] == 1

    # two-term query ranks the doc containing both terms first
    scored = {r["doc_id"]: r["bm25"]
              for r in bm25_scores(docs, ["banana", "cherry"], k1=K1, b=B).collect()}
    assert scored[2] > scored[1]


def test_tfidf_matches_duckdb(spark):
    import os

    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    tl = ", ".join(f"'{t}'" for t in TERMS)
    sql = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM read_parquet('{path}')
), dt AS (
    SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM dt GROUP BY ALL
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
dfs AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
    WHERE term IN ({tl}) GROUP BY term
)
SELECT tf.doc_id,
       FLOOR(SUM(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfs.df)) * 1000000 + 0.5) / 1000000 AS tfidf
FROM tf JOIN dfs USING (term) CROSS JOIN n
WHERE tf.term IN ({tl})
GROUP BY tf.doc_id
"""
    got = sorted(map(tuple, tfidf_scores(
        table(spark, SF_CORRECTNESS, "documents"), TERMS).collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert len(got) == len(want) > 0
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd
        assert gs == pytest.approx(ws, abs=2e-6)


def test_bm25_plan_broadcasts_term_stats(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    plan = (
        bm25_scores(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # corpus-side scan stays single: no join shuffles the full corpus
    assert plan.count("SortMergeJoin") == 0


ALPHA = 0.5


def _bigram_lm_sql(path: str, alpha: float) -> str:
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM read_parquet('{path}')
), flat AS (
    SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
    FROM toks WHERE len(t) >= 2
), bi AS (
    SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        FROM flat
    ) WHERE w2 IS NOT NULL
), bc AS (
    SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY ALL
), cc AS (
    SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY ALL
), v AS (
    SELECT COUNT(DISTINCT w) AS vsize FROM (SELECT unnest(t) AS w FROM toks)
), s AS (
    SELECT doc_id, ln((c12 + {alpha}) / (c1 + {alpha} * vsize)) AS lp
    FROM bi JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       FLOOR(AVG(lp) * 1000000 + 0.5) / 1000000 AS avg_logp,
       FLOOR(EXP(-AVG(lp)) * 1000000 + 0.5) / 1000000 AS ppl
FROM s GROUP BY doc_id
"""


def test_bigram_lm_oracle_on_documents(spark):
    import os

    from lakehouse_file_format_compare_spark.operators.ranking import bigram_lm_scores

    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    got = sorted(
        map(tuple, bigram_lm_scores(table(spark, SF_CORRECTNESS, "documents"),
                                    alpha=ALPHA).collect())
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(_bigram_lm_sql(path, ALPHA)).fetchall()))
    con.close()
    assert len(got) == len(want) > 0
    for (gd, gn, gl, gp), (wd, wn, wl, wp) in zip(got, want):
        assert (gd, gn) == (wd, wn)
        assert gl == pytest.approx(wl, abs=2e-6)
        assert gp == pytest.approx(wp, abs=2e-6 * max(1.0, wp))


def test_bigram_lm_hand_values(spark):
    import math

    from lakehouse_file_format_compare_spark.operators.ranking import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs, alpha=1.0).collect()}
    # corpus: c(a,b)=3, c(b,a)=1; contexts c(a.)=3, c(b.)=1; V=3
    assert set(rows) == {1, 2}            # single-token doc 3 dropped
    assert rows[1]["n_bigrams"] == 3 and rows[2]["n_bigrams"] == 1
    p_ab = (3 + 1) / (3 + 3)              # 2/3
    p_ba = (1 + 1) / (1 + 3)              # 1/2
    want1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert rows[1]["avg_logp"] == pytest.approx(want1, abs=2e-6)
    assert rows[2]["avg_logp"] == pytest.approx(math.log(p_ab), abs=2e-6)
    # the repetitive doc is MORE probable under the corpus LM
    assert rows[1]["ppl"] < 1 / p_ab + 1e-6 or rows[1]["ppl"] > 0


def test_bigram_lm_plan_shape(spark):
    from lakehouse_file_format_compare_spark.operators.ranking import bigram_lm_scores

    plan = (
        bigram_lm_scores(table(spark, SF_CORRECTNESS, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # context counts and vocab size broadcast; bigram join does not
    assert plan.count("BroadcastExchange") >= 2


def test_oov_rate_oracle_on_documents(spark):
    import os

    from lakehouse_file_format_compare_spark.operators.ranking import oov_rate_scores

    VOCAB = 20  # the synthetic corpus has ~31 distinct tokens; 20 makes a real cut
    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    got = sorted(
        map(tuple, oov_rate_scores(table(spark, SF_CORRECTNESS, "documents"),
                                   vocab_size=VOCAB).collect())
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> length(t) > 0) AS t
            FROM read_parquet('{path}')
        ), flat AS (
            SELECT doc_id, unnest(t) AS term FROM toks
        ), vocab AS (
            SELECT term FROM (
                SELECT term, COUNT(*) AS n FROM flat GROUP BY term
                ORDER BY n DESC, term LIMIT {VOCAB}
            )
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS oov_tokens,
               FLOOR(SUM(CASE WHEN v.term IS NULL THEN 1.0 ELSE 0.0 END) / COUNT(*)
                     * 1000000 + 0.5) / 1000000 AS oov_rate
        FROM flat f LEFT JOIN vocab v USING (term)
        GROUP BY doc_id
    """).fetchall()))
    con.close()
    assert got == want
    rates = [r[3] for r in got]
    assert 0.0 < sum(rates) / len(rates) < 1.0  # non-vacuous cut


def test_oov_rate_hand_values(spark):
    from lakehouse_file_format_compare_spark.operators.ranking import oov_rate_scores

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a zz qq"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in oov_rate_scores(docs, vocab_size=2).collect()}
    # counts: a=4, b=1, zz=1, qq=1 -> top-2 by (count desc, term asc) = {a, b}
    assert set(rows) == {1, 2}
    assert rows[1]["oov_tokens"] == 0 and rows[1]["oov_rate"] == 0.0
    assert rows[2]["oov_tokens"] == 2 and rows[2]["oov_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_oov_rate_plan_shape(spark):
    from lakehouse_file_format_compare_spark.operators.ranking import oov_rate_scores

    plan = (
        oov_rate_scores(table(spark, SF_CORRECTNESS, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan      # top-K cut, not a global sort
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- hybrid_rrf (r10) ---

def test_hybrid_rrf_hand_fixture(spark):
    """Known ranks → known integer fusion: lexical list ranks docs
    (1,2,3), semantic ranks (2,4); RRF k=60 contributions are
    floor(1e9/(60+rank)) per list, absent ranks contribute 0."""
    from lakehouse_file_format_compare_spark.operators.ranking import hybrid_rrf

    lex = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, bm25 double"
    )
    sem = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, cosine double"
    )
    got = {
        r.doc_id: (r.rrf_nano, r.lex_rank, r.sem_rank)
        for r in hybrid_rrf(lex, sem, rrf_k=60, top_n=10).collect()
    }
    c = lambda r: 10**9 // (60 + r)  # noqa: E731
    assert got == {
        1: (c(1), 1, 0),
        2: (c(2) + c(1), 2, 1),
        3: (c(3), 3, 0),
        4: (c(2), 0, 2),
    }
    # doc 2 (in both lists) must outrank every single-list doc
    order = sorted(got, key=lambda d: (-got[d][0], d))
    assert order[0] == 2


def test_hybrid_rrf_candidate_cut_and_top_n(spark):
    """candidates bounds each list before ranking; top_n bounds the
    fused output; ties in rrf_nano break to the smaller id."""
    from lakehouse_file_format_compare_spark.operators.ranking import hybrid_rrf

    lex = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "doc_id long, bm25 double"
    )
    sem = spark.createDataFrame(
        [(i + 100, float(100 - i)) for i in range(10)],
        "doc_id long, cosine double",
    )
    rows = hybrid_rrf(lex, sem, rrf_k=60, top_n=4, candidates=3).collect()
    assert len(rows) == 4
    # disjoint lists with identical score shapes → rank-r docs from the
    # two lists tie; smaller id (the lexical side: 0,1,...) wins
    assert [r.doc_id for r in rows] == [0, 100, 1, 101]
    assert max(max(r.lex_rank, r.sem_rank) for r in rows) <= 3


def test_hybrid_rrf_layout_invariance_and_plan(spark):
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.functions.numeric import grid
    from lakehouse_file_format_compare_spark.functions.vectors import cosine
    from lakehouse_file_format_compare_spark.operators.ranking import (
        bm25_scores,
        hybrid_rrf,
    )

    docs = table(spark, SF_CORRECTNESS, "documents")
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    sem = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").cast("long").alias("doc_id"),
            grid(cosine(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
    )
    lex = bm25_scores(docs, ["data", "merge", "vector"]).select("doc_id", "bm25")
    a = [tuple(r) for r in hybrid_rrf(lex, sem).collect()]
    b = [
        tuple(r)
        for r in hybrid_rrf(
            lex.repartition(7, "doc_id"), sem.repartition(1)
        ).collect()
    ]
    assert a == b and len(a) == 10
    plan = (
        hybrid_rrf(lex, sem)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # candidate cut + final top-n
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_rrf(lex, sem, k=60, top_n=10, candidates=50):
    """Pure-Python mirror of hybrid_rrf: rank by (score desc, id),
    cut to candidates, fuse floor(1e9/(k+rank)), top_n by
    (rrf desc, id)."""
    def ranks(scored):
        order = sorted(scored, key=lambda t: (-t[1], t[0]))[:candidates]
        return {d: i + 1 for i, (d, _) in enumerate(order)}

    lr, sr = ranks(lex), ranks(sem)
    fused = {}
    for d in set(lr) | set(sr):
        c = 0
        if d in lr:
            c += 10**9 // (k + lr[d])
        if d in sr:
            c += 10**9 // (k + sr[d])
        fused[d] = (c, lr.get(d, 0), sr.get(d, 0))
    top = sorted(fused.items(), key=lambda kv: (-kv[1][0], kv[0]))[:top_n]
    return {d: v for d, v in top}


@given(
    lex=st.dictionaries(st.integers(0, 30), st.integers(0, 8), max_size=12),
    sem=st.dictionaries(st.integers(0, 30), st.integers(0, 8), max_size=12),
    cand=st.integers(1, 6),
    top_n=st.integers(1, 8),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_hybrid_rrf_matches_python_reference(spark, lex, sem, cand, top_n):
    """Integer scores make rank order (score desc, id) unambiguous, so
    the Spark fusion must equal the pure-Python mirror exactly —
    including candidate-cut boundaries and tie-breaks."""
    from lakehouse_file_format_compare_spark.operators.ranking import hybrid_rrf

    lexdf = spark.createDataFrame(
        [(d, float(s)) for d, s in lex.items()] or [(None, None)],
        "doc_id long, bm25 double",
    ).where("doc_id IS NOT NULL")
    semdf = spark.createDataFrame(
        [(d, float(s)) for d, s in sem.items()] or [(None, None)],
        "doc_id long, cosine double",
    ).where("doc_id IS NOT NULL")
    got = {
        r.doc_id: (r.rrf_nano, r.lex_rank, r.sem_rank)
        for r in hybrid_rrf(
            lexdf, semdf, rrf_k=60, top_n=top_n, candidates=cand
        ).collect()
    }
    assert got == _py_rrf(
        list(lex.items()), list(sem.items()), 60, top_n, cand
    )
