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
