"""Benchmark decontamination (operators/decontaminate.py): exact
DuckDB oracle on corpus-x-eval n-gram overlap using real testdata as
the corpus and engineered eval docs (verbatim snippets lifted from
corpus documents -> guaranteed non-vacuous hits), plus plan pins
(eval side broadcasts; no cartesian)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.decontaminate import (
    decontaminate,
    ngram_contamination,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

N = 5  # short n for testable overlap on synthetic text


@pytest.fixture(scope="module")
def eval_fixture(spark, tmp_path_factory):
    """Eval docs = verbatim 8-token snippets from 5 corpus documents
    (guaranteed contamination) + one novel doc (guaranteed clean)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = (
        table(spark, SF_CORRECTNESS, "documents")
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    evals = []
    for i, r in enumerate(rows):
        toks = r["text"].split()
        evals.append((1000 + i, " ".join(toks[:8])))
    evals.append((2000, "zxq wvu tsr qpo nml kji hgf edc"))
    path = str(tmp_path_factory.mktemp("eval") / "eval.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([e[0] for e in evals], type=pa.int64()),
            "text": pa.array([e[1] for e in evals], type=pa.string()),
        }),
        path,
    )
    return path


def _oracle_sql(corpus_path: str, eval_path: str, n: int) -> str:
    def grams(src, out_id):
        return f"""
    SELECT doc_id AS {out_id}, unnest(gs) AS ngram FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= {n}
                    THEN list_distinct(list_transform(range(1, len(t) - {n} + 2),
                                       i -> array_to_string(t[i:i+{n}-1], ' ')))
                    ELSE [] END AS gs
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 t -> length(t) > 0) AS t
              FROM read_parquet('{src}'))
    )"""

    return f"""
WITH c AS ({grams(corpus_path, "doc_id")}),
     e AS ({grams(eval_path, "eval_id")})
SELECT c.doc_id, e.eval_id, COUNT(*) AS shared_ngrams
FROM c JOIN e USING (ngram)
GROUP BY 1, 2
"""


def test_contamination_oracle(spark, eval_fixture):
    corpus_path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = spark.read.parquet(eval_fixture)
    got = sorted(map(tuple, ngram_contamination(corpus, ev, n=N).collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(
        _oracle_sql(corpus_path, eval_fixture, N)).fetchall()))
    con.close()
    assert got == want
    assert len(got) >= 5  # every lifted snippet must hit its source doc


def test_decontaminate_drops_only_flagged(spark, eval_fixture):
    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = spark.read.parquet(eval_fixture)
    flagged = {
        r["doc_id"]
        for r in ngram_contamination(corpus, ev, n=N).select("doc_id").distinct().collect()
    }
    # the 5 source docs are flagged (snippets are verbatim)
    src_ids = {r["doc_id"] for r in corpus.orderBy("doc_id").limit(5).collect()}
    assert src_ids <= flagged
    clean = decontaminate(corpus, ev, n=N)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept.isdisjoint(flagged)
    assert kept | flagged == {r["doc_id"] for r in corpus.select("doc_id").collect()}
    # the novel eval doc contaminates nothing
    assert not any(
        r["eval_id"] == 2000
        for r in ngram_contamination(corpus, ev, n=N).collect()
    )


def test_contamination_plan_broadcasts_eval_side(spark, eval_fixture):
    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = spark.read.parquet(eval_fixture)
    plan = (
        ngram_contamination(corpus, ev, n=N)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Fuzzy (MinHash) decontamination — r6: catches paraphrased/edited
# leaks whose long n-grams are all broken.
# ---------------------------------------------------------------------------

# every 12th token replaced: any 13 consecutive tokens contain >= 1
# replacement, so NO original 13-gram survives (exact test blind),
# while ~75% of 3-shingles survive (Jaccard ~0.6, fuzzy test sees it)
_EDIT_EVERY = 12
_FUZZY_TH = 0.4


def _edited_eval(spark):
    """Eval docs = every-12th-token-corrupted copies of 10 corpus docs,
    built with the SAME normalize/tokenize convention as the shingle
    machinery so the DuckDB replica is bit-identical."""
    docs = table(spark, SF_CORRECTNESS, "documents").where(F.col("doc_id") % 50 == 0)
    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")), " "
    )
    edited = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when((i + 1) % _EDIT_EVERY == 0, F.lit("xq7")).otherwise(t),
        ),
        " ",
    )
    return docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), edited.alias("text")
    )


def _fuzzy_oracle_sql(corpus_path: str, th: float) -> str:
    shingles = """
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                    list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                    ELSE [] END AS sh
        FROM toked"""
    return f"""
WITH corpus AS (
    SELECT doc_id, text FROM read_parquet('{corpus_path}')
), ctoked AS (
    -- list_filter mirrors Spark: split of '' must yield no tokens
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM corpus
), etoked AS (
    SELECT doc_id + 100000 AS doc_id,
           list_transform(range(1, len(t) + 1),
                          i -> CASE WHEN i % {_EDIT_EVERY} = 0 THEN 'xq7' ELSE t[i] END) AS t
    FROM ctoked WHERE doc_id % 50 = 0
), csh AS (
    SELECT doc_id AS doc, unnest(sh) AS shingle
    FROM (WITH toked AS (SELECT * FROM ctoked) {shingles})
), esh AS (
    SELECT doc_id AS eval_id, unnest(sh) AS shingle
    FROM (WITH toked AS (SELECT * FROM etoked) {shingles})
), csz AS (SELECT doc, COUNT(*) AS sz_c FROM csh GROUP BY doc),
   esz AS (SELECT eval_id, COUNT(*) AS sz_e FROM esh GROUP BY eval_id),
   common AS (
    SELECT c.doc AS doc_id, e.eval_id, COUNT(*) AS common
    FROM csh c JOIN esh e USING (shingle) GROUP BY 1, 2
)
SELECT doc_id, eval_id,
       floor((common / CAST(sz_c + sz_e - common AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM common JOIN csz ON doc = doc_id JOIN esz USING (eval_id)
WHERE common / CAST(sz_c + sz_e - common AS DOUBLE) >= {th}
"""


def test_fuzzy_contamination_oracle_and_exact_blindness(spark):
    """The edited leaks are INVISIBLE to the exact 13-gram test but
    recovered by the shingle-Jaccard paths: the exact inverted-index
    path must EQUAL the DuckDB cross-frame Jaccard pair set (values
    included — it is deterministic, so it carries the value oracle),
    and the probabilistic MinHash path must be a precision-1.0 subset
    with recall >= 0.9 of it (banding recall is a dial, never an
    exact-oracle subject — the dedup_minhash_lsh convention)."""
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        jaccard_contamination,
        minhash_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = _edited_eval(spark)
    n_eval = ev.count()
    assert n_eval == 10

    # exact 13-gram: blind to the edits
    assert ngram_contamination(corpus, ev, n=13).count() == 0

    got = sorted(map(tuple, jaccard_contamination(corpus, ev, threshold=_FUZZY_TH).collect()))
    corpus_path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(_fuzzy_oracle_sql(corpus_path, _FUZZY_TH)).fetchall()))
    con.close()
    assert got == want
    # every source doc is recovered for its edited copy
    pairs = {(a, b) for a, b, _ in got}
    assert all((e - 100000, e) in pairs for e in
               (r["doc_id"] for r in ev.select("doc_id").collect()))

    lsh = {
        (r["doc_id"], r["eval_id"])
        for r in minhash_contamination(corpus, ev, threshold=_FUZZY_TH).collect()
    }
    assert lsh <= pairs                    # precision 1.0 (verified candidates)
    assert len(lsh) >= 0.9 * len(pairs)    # banding recall floor


def test_decontaminate_fuzzy_drops_sources(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        decontaminate_fuzzy,
        minhash_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = _edited_eval(spark)
    flagged = {
        r["doc_id"]
        for r in minhash_contamination(corpus, ev, threshold=_FUZZY_TH)
        .select("doc_id").distinct().collect()
    }
    clean = decontaminate_fuzzy(corpus, ev, threshold=_FUZZY_TH)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept.isdisjoint(flagged)
    assert kept | flagged == {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert len(flagged) >= 10  # at least every source doc


def test_fuzzy_contamination_plan_broadcasts_eval(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        minhash_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    ev = _edited_eval(spark)
    plan = (
        minhash_contamination(corpus, ev, threshold=_FUZZY_TH)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- span-grain decontamination (r7) ----------------------------------------

SC_L = 12


def _sc_eval(spark):
    """Eval docs = the middle 20 tokens of every doc_id % 40 == 0
    corpus doc, wrapped in eval-only filler — the 'benchmark question
    embedded verbatim' regime that n-gram counting localizes poorly
    and Jaccard dilutes below threshold."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: F.length(t) > 0)
    snippet = F.array_join(F.slice(toks, 11, 20), " ")
    return docs.where(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(
            F.lit("evalprefix qq ww "), snippet, F.lit(" rr tt evalsuffix")
        ).alias("text"),
    )


SC_ORACLE_SQL = f"""
WITH ct AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM read_parquet('{{corpus}}')
), ev AS (
    SELECT doc_id + 900000 AS doc_id,
           'evalprefix qq ww ' || array_to_string(t[11:30], ' ')
               || ' rr tt evalsuffix' AS text
    FROM ct WHERE doc_id % 40 = 0
), et AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM ev
), cg AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{SC_L - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SC_L} + 2)) AS i
          FROM ct WHERE len(t) >= {SC_L})
), eg AS (
    SELECT doc_id AS eval_id, i AS pos, array_to_string(t[i:i+{SC_L - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SC_L} + 2)) AS i
          FROM et WHERE len(t) >= {SC_L})
), m AS (
    SELECT c.doc_id, e.eval_id, c.pos AS pos_c, e.pos AS pos_e
    FROM cg c JOIN eg e USING (g)
), runs AS (
    SELECT doc_id, eval_id, pos_c, pos_e, pos_c - pos_e AS diag,
           pos_c - row_number() OVER (PARTITION BY doc_id, eval_id, pos_c - pos_e
                                      ORDER BY pos_c) AS grp
    FROM m
)
SELECT doc_id, eval_id, MIN(pos_c) AS doc_start, MIN(pos_e) AS eval_start,
       COUNT(*) + {SC_L - 1} AS span_tokens
FROM runs GROUP BY doc_id, eval_id, diag, grp
"""


def test_substring_contamination_matches_duckdb_oracle(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        substring_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    got = sorted(
        tuple(r)
        for r in substring_contamination(
            corpus, _sc_eval(spark), min_span_tokens=SC_L
        ).collect()
    )
    corpus_path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    con = duckdb.connect()
    want = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(SC_ORACLE_SQL.format(corpus=corpus_path)).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) >= 10  # every lifted snippet found


def test_substring_contamination_localizes_the_lifted_region(spark):
    """Each eval doc's snippet is tokens 11..30 of its source doc and
    sits at eval positions 4..23 — the reported span must cover
    exactly that region: doc_start=11, eval_start=4, span_tokens=20
    (filler tokens are eval-only, so the span cannot extend)."""
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        substring_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    n_tok = {
        r["doc_id"]: len(r["text"].split()) for r in corpus.collect()
    }
    spans = {}
    for r in substring_contamination(
        corpus, _sc_eval(spark), min_span_tokens=SC_L
    ).collect():
        spans.setdefault((r["doc_id"], r["eval_id"]), []).append(
            (r["doc_start"], r["eval_start"], r["span_tokens"])
        )
    checked = 0
    for did, n in n_tok.items():
        if did % 40 == 0 and n >= 30:
            assert (11, 4, 20) in spans.get((did, did + 900000), []), did
            checked += 1
    assert checked >= 10


def test_substring_contamination_plan_broadcasts_eval_side(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        substring_contamination,
    )

    corpus = table(spark, SF_CORRECTNESS, "documents")
    df = substring_contamination(corpus, _sc_eval(spark), min_span_tokens=SC_L)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
