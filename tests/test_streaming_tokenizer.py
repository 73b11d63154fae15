"""Streaming tokenizer-budget monitor (streaming/tokenizer_stream.py,
r10 late-round): draining document files one micro-batch at a time
must produce EXACTLY the batch tokenization of the full input
(literal model ⇒ stateless map), the greedy-gap aggregate is
non-negative (Viterbi optimality observed on real traffic), and a
full-source replay is a no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import (
    StreamingTokenizerMonitor,
)
from tests.conftest import SF_SMOKE

CUTS = [(0, 170), (170, 340), (340, 500)]
VOCAB = {
    "th": 2_000_000_000, "the": 2_300_000_000, "da": 2_100_000_000,
    "ta": 2_050_000_000, "data": 3_000_000_000, "a": 3_500_000_000,
    "e": 3_400_000_000,
}


@pytest.fixture(scope="module")
def corpus(spark):
    return table(spark, SF_SMOKE, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def drained(spark, corpus, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("tok_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    root = str(tmp_path_factory.mktemp("tok_wh"))
    ckpt = str(tmp_path_factory.mktemp("tok_ckpt"))
    mon = StreamingTokenizerMonitor(Warehouse(spark, root), ckpt, vocab=VOCAB)
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    mon.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    return mon, src, schema


def _budgets(wh):
    return {
        r.doc_id: (
            r.n_words, r.n_uv_tokens, r.uv_cost_nanos,
            r.n_wp_tokens, r.wp_cost_micros,
        )
        for r in wh.read_table("silver", "docs__tok_budgets").collect()
    }


def test_drain_equals_batch_tokenization(spark, corpus, drained):
    mon, _, _ = drained
    got = _budgets(mon.warehouse)
    want = {
        r.doc_id: (
            r.n_words, r.n_uv_tokens, r.uv_cost_nanos,
            r.n_wp_tokens, r.wp_cost_micros,
        )
        for r in mon.score_batch(corpus).collect()
    }
    assert got == want
    assert len(got) == corpus.count()


def test_budget_report_and_viterbi_optimality(spark, corpus, drained):
    mon, _, _ = drained
    row = mon.budget_report("docs").collect()[0]
    got = _budgets(mon.warehouse)
    assert row.docs == len(got)
    assert row.words == sum(v[0] for v in got.values())
    assert row.uv_tokens == sum(v[1] for v in got.values())
    assert row.wp_tokens == sum(v[3] for v in got.values())
    # Viterbi is cost-optimal: the greedy gap can never be negative
    assert row.greedy_gap_nanos >= 0
    assert row.greedy_gap_nanos == sum(
        v[4] * 1000 - v[2] for v in got.values()
    )


def test_replay_is_idempotent(spark, corpus, drained):
    mon, src, schema = drained
    before = _budgets(mon.warehouse)
    import tempfile

    replay = StreamingTokenizerMonitor(
        mon.warehouse, tempfile.mkdtemp(prefix="tok_ckpt_replay"),
        vocab=VOCAB,
    )
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    assert _budgets(mon.warehouse) == before
