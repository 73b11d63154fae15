"""Incremental MinHash dedup (operators/dedup.py): folding id-ordered
batches through the signature store must EXACTLY equal one full run
over the union; planted cross-batch duplicates are always dropped;
the store indexes every seen doc; plans stay bucket-joined (no
cartesian). A case test documents WHY the store keeps dropped docs'
signatures (survivors-only would not commute with the full run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    full_minhash_est_dedup,
    incremental_minhash_dedup,
    signature_est_jaccard,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.5
SPLIT = 250  # sf0.001 documents: doc_id 0..499; batch1 < 250 <= batch2


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 documents with planted cross-batch duplicates: every
    batch-2 doc with doc_id % 5 == 1 gets the text of doc_id - SPLIT
    (a batch-1 doc, since batches split at doc_id = SPLIT)."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    donors = docs.select(
        (F.col("doc_id") + SPLIT).alias("doc_id"),
        F.col("text").alias("__donor"),
    )
    planted = (
        docs.join(donors, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") >= SPLIT)
                & (F.pmod(F.col("doc_id"), F.lit(5)) == 1)
                & F.col("__donor").isNotNull(),
                F.col("__donor"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return planted.cache()


def _batches(corpus):
    b1 = corpus.where(F.col("doc_id") < SPLIT)
    b2 = corpus.where(F.col("doc_id") >= SPLIT)
    return b1, b2


def _planted_ids(corpus):
    return {
        r.doc_id
        for r in corpus.where(
            (F.col("doc_id") >= SPLIT) & (F.pmod(F.col("doc_id"), F.lit(5)) == 1)
        ).collect()
    }


def test_incremental_fold_equals_full_run(spark, corpus):
    b1, b2 = _batches(corpus)
    kept1, store1 = incremental_minhash_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_minhash_dedup(b2, store1, threshold=THRESHOLD)
    inc_kept = sorted(
        r.doc_id for r in kept1.unionByName(kept2).select("doc_id").collect()
    )
    full_kept = sorted(
        r.doc_id
        for r in full_minhash_est_dedup(corpus, threshold=THRESHOLD)
        .select("doc_id")
        .collect()
    )
    assert inc_kept == full_kept
    assert len(inc_kept) < corpus.count()  # something was actually dropped


def test_planted_cross_batch_duplicates_always_dropped(spark, corpus):
    """Identical text => identical signature => same bucket in every
    band => candidate => est 1.0 => dropped. Deterministic, no recall
    dial involved."""
    b1, b2 = _batches(corpus)
    _, store1 = incremental_minhash_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_minhash_dedup(b2, store1, threshold=THRESHOLD)
    planted = _planted_ids(corpus)
    kept_ids = {r.doc_id for r in kept2.select("doc_id").collect()}
    assert planted, "fixture must plant duplicates"
    assert not (planted & kept_ids)


def test_store_indexes_every_seen_doc(spark, corpus):
    b1, b2 = _batches(corpus)
    kept1, store1 = incremental_minhash_dedup(b1, None, threshold=THRESHOLD)
    kept2, store2 = incremental_minhash_dedup(b2, store1, threshold=THRESHOLD)
    # the store carries ALL seen docs (testdata docs are all tokenful),
    # kept or dropped — that is what makes the fold commute
    assert store1.count() == b1.count()
    assert store2.count() == corpus.count()
    assert kept1.count() + kept2.count() < store2.count()
    store_ids = {r.doc for r in store2.select("doc").collect()}
    assert store_ids == {r.doc_id for r in corpus.select("doc_id").collect()}


def test_dropped_docs_must_stay_indexed(spark):
    """The semantic reason the store is not survivors-only: doc 20 is
    a near-dup of dropped doc 10 but NOT of 10's canonical twin 0
    (similarity is not transitive). A survivors-only store would keep
    20; the full run drops it. The real store drops it."""
    half_a = "alpha beta gamma delta epsilon zeta eta theta"
    half_b = "iota kappa lam mu nu xi omicron pi"
    half_c = "rho sigma tau upsilon phi chi psi omega"
    docs = [
        (0, half_a + " " + half_b),   # canonical
        (10, half_a + " " + half_c),  # ~0.5-ish to 0 AND to 20
        (20, half_c + " one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # verify the planted similarity structure under est-jaccard by
    # running the full reference: with threshold tuned so 0~10 and
    # 10~20 pair but 0~20 does not, the full run keeps only 0
    full = full_minhash_est_dedup(df, threshold=0.3)
    full_ids = sorted(r.doc_id for r in full.select("doc_id").collect())
    if full_ids != [0]:
        pytest.skip("est-jaccard draw did not produce the chain fixture")
    b1 = df.where(F.col("doc_id") < 20)
    b2 = df.where(F.col("doc_id") >= 20)
    _, store1 = incremental_minhash_dedup(b1, None, threshold=0.3)
    kept2, _ = incremental_minhash_dedup(b2, store1, threshold=0.3)
    assert kept2.count() == 0  # 20 caught via the indexed-but-dropped 10


def test_est_jaccard_is_one_for_identical_and_low_for_disjoint(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4], [1, 2, 3, 4]), ([1, 2, 3, 4], [5, 6, 7, 8]),
         ([1, 2, 3, 4], [1, 2, 7, 8])],
        "a array<long>, b array<long>",
    )
    got = df.select(
        signature_est_jaccard(F.col("a"), F.col("b"), 4).alias("j")
    ).collect()
    assert [r.j for r in got] == [1.0, 0.0, 0.5]


def test_first_batch_with_none_history_equals_full(spark, corpus):
    kept, store = incremental_minhash_dedup(corpus, None, threshold=THRESHOLD)
    full = full_minhash_est_dedup(corpus, threshold=THRESHOLD)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == sorted(
        r.doc_id for r in full.select("doc_id").collect()
    )
    assert store.count() == corpus.count()


def test_three_batch_fold_equals_full_run(spark, corpus):
    """The fold property is per-step, so it must hold for ANY number
    of id-ordered batches, not just two."""
    cuts = [(0, 170), (170, 340), (340, 500)]
    store, kept_all = None, []
    for lo, hi in cuts:
        batch = corpus.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        kept, store = incremental_minhash_dedup(
            batch, store, threshold=THRESHOLD
        )
        kept_all.extend(r.doc_id for r in kept.select("doc_id").collect())
    full_kept = sorted(
        r.doc_id
        for r in full_minhash_est_dedup(corpus, threshold=THRESHOLD)
        .select("doc_id")
        .collect()
    )
    assert sorted(kept_all) == full_kept


def test_plan_is_bucket_joined_no_cartesian(spark, corpus):
    b1, b2 = _batches(corpus)
    _, store1 = incremental_minhash_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_minhash_dedup(b2, store1, threshold=THRESHOLD)
    plan = kept2._sc._jvm.PythonSQLUtils.explainString(
        kept2._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
