"""Streaming perplexity scoring against a frozen LM model store
(streaming/lm_stream.py, r10): draining document files one
micro-batch at a time must produce EXACTLY the batch scoring of the
full input (frozen model ⇒ stateless map), flags match the operator's
integer contract, and replaying the whole source is a no-op
(idempotent insert-only merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.lm import (
    bigram_lm_score,
    bigram_lm_train,
    flag_high_perplexity,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import (
    StreamingPerplexityScorer,
)
from tests.conftest import SF_SMOKE

CUTS = [(0, 170), (170, 340), (340, 500)]


@pytest.fixture(scope="module")
def corpus(spark):
    return table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang"
    ).cache()


@pytest.fixture(scope="module")
def drained(spark, corpus, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("lm_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id", "text")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    root = str(tmp_path_factory.mktemp("lm_wh"))
    ckpt = str(tmp_path_factory.mktemp("lm_ckpt"))
    scorer = StreamingPerplexityScorer(Warehouse(spark, root), ckpt)
    scorer.train_to_store(corpus.where(F.col("lang") == "en"), "docs")
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    scorer.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    return scorer, src, schema


def _scores(wh):
    return {
        r.doc_id: (r.n_bigrams, r.lp_nanos, r.flagged)
        for r in wh.read_table("silver", "docs__lm_scores").collect()
    }


def test_drain_equals_batch_scoring(spark, corpus, drained):
    scorer, _, _ = drained
    got = _scores(scorer.warehouse)
    model, ctx_totals, vocab = bigram_lm_train(
        corpus.where(F.col("lang") == "en")
    )
    want = {
        r.doc_id: (r.n_bigrams, r.lp_nanos, r.flagged)
        for r in flag_high_perplexity(
            bigram_lm_score(corpus, model, ctx_totals, vocab)
        ).collect()
    }
    assert got == want
    assert len(got) == corpus.count()


def test_flagged_rate_monitor(spark, corpus, drained):
    scorer, _, _ = drained
    row = scorer.flagged_rate("docs").collect()[0]
    got = _scores(scorer.warehouse)
    assert row.scored_docs == len(got)
    assert row.flagged_docs == sum(1 for _, _, fl in got.values() if fl)


def test_replay_is_idempotent(spark, corpus, drained):
    scorer, src, schema = drained
    before = _scores(scorer.warehouse)
    import tempfile

    replay = StreamingPerplexityScorer(
        scorer.warehouse, tempfile.mkdtemp(prefix="lm_ckpt_replay")
    )
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    assert _scores(scorer.warehouse) == before
