"""Composed corpus pipeline (ext/corpus.py): stage monotonicity,
split/pack contracts, and end-to-end determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.ext.corpus import (
    CorpusConfig,
    build_corpus,
    dedup_stage,
    quality_gate,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

SF = SF_CORRECTNESS

CFG = CorpusConfig(min_chars=50, min_quality=0.2, pack_budget_tokens=256, pack_groups=4)


@pytest.fixture(scope="module")
def corpus(spark):
    return build_corpus(table(spark, SF_CORRECTNESS, "documents"), CFG).cache()


def test_stage_monotonicity(spark, corpus):
    docs = table(spark, SF_CORRECTNESS, "documents")
    n_raw = docs.count()
    n_gated = quality_gate(docs, CFG).count()
    n_deduped = dedup_stage(quality_gate(docs, CFG), CFG).count()
    n_final = corpus.count()
    assert n_raw >= n_gated >= n_deduped == n_final
    assert n_final > 100  # the gates must not annihilate the corpus


def test_split_and_pack_contracts(corpus):
    rows = corpus.select("doc_id", "split", "pack_id", "n_tokens").collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # a pack never straddles splits: key packs by (split, pack_id)
    packs = {}
    for r in rows:
        packs.setdefault((r["split"], r["pack_id"]), []).append(r["n_tokens"])
    max_doc = max(r["n_tokens"] for r in rows)
    for (_, _), toks in packs.items():
        assert sum(toks) < CFG.pack_budget_tokens + max_doc
    # every doc exactly once
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_end_to_end_deterministic_across_layouts(spark, corpus):
    shuffled = build_corpus(
        table(spark, SF_CORRECTNESS, "documents").repartition(13), CFG
    )
    a = sorted(map(tuple, corpus.select("doc_id", "split", "pack_id").collect()))
    b = sorted(map(tuple, shuffled.select("doc_id", "split", "pack_id").collect()))
    assert a == b


def test_hygiene_serving_path_agrees_with_contract_row(spark):
    """r7 (r6 verdict #4): corpus_hygiene_serving is the bench's
    serving-path variant of corpus_hygiene_suite — every column it
    emits must equal the contract row's same-named column (the serving
    path drops verification work, never changes metric values)."""
    from lakehouse_file_format_compare_spark.plans.hygiene_plans import (
        corpus_hygiene_serving,
        corpus_hygiene_suite,
    )

    serving = corpus_hygiene_serving(spark, SF_CORRECTNESS).collect()[0].asDict()
    contract = corpus_hygiene_suite(spark, SF_CORRECTNESS).collect()[0].asDict()
    assert set(serving) <= set(contract)
    for col, val in serving.items():
        assert val == contract[col], (col, val, contract[col])


def test_composed_pipeline_with_r7_gates(spark):
    """build_corpus with the r7 stages active: the NB classifier gate
    drops exactly the spam-injected docs, the decontamination gate
    drops exactly the docs whose text feeds the eval set, and the
    composition stays deterministic across partition layouts."""
    from lakehouse_file_format_compare_spark.operators.classify import nb_train

    docs = table(spark, SF_CORRECTNESS, "documents")
    spam = " win free prize click now offer deal bonus"
    injected = docs.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(9)) == 0, F.concat(F.col("text"), F.lit(spam))
        ).otherwise(F.col("text")).alias("text"),
    )
    # seed model trained on a disjoint labeled construction
    seed = docs.limit(400).select(
        "doc_id",
        (F.pmod("doc_id", F.lit(2)) == 0).cast("int").alias("label"),
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0, F.concat(F.col("text"), F.lit(spam))
        ).otherwise(F.col("text")).alias("text"),
    )
    model = nb_train(seed)
    # eval set: verbatim middle snippets of every 37th doc
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: F.length(t) > 0
    )
    eval_docs = docs.where(F.pmod("doc_id", F.lit(37)) == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.array_join(F.slice(toks, 5, 16), " ").alias("text"),
    )

    out = build_corpus(injected, CFG, eval_docs=eval_docs, classifier=model)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # no spam-injected doc survives the classifier gate
    assert not any(k % 9 == 0 for k in kept)
    # no eval-source doc survives decontamination
    assert not any(k % 37 == 0 for k in kept)
    assert len(kept) > 100  # gates must not annihilate the corpus

    # determinism across layouts with the same trained model
    again = build_corpus(
        injected.repartition(11), CFG, eval_docs=eval_docs, classifier=model
    )
    a = sorted(map(tuple, out.select("doc_id", "split", "pack_id").collect()))
    b = sorted(map(tuple, again.select("doc_id", "split", "pack_id").collect()))
    assert a == b


def test_shared_docs_cache_mtime_invalidation(spark, tmp_path):
    """The shared persisted corpus frame (r8) is keyed by file mtime:
    overwriting documents.parquet must invalidate the cached frame
    (stale unpersisted, fresh data served), and repeated calls with
    an unchanged file must return the SAME cached DataFrame object."""
    import os
    import shutil
    import time as _time

    from lakehouse_file_format_compare_spark.plans.hygiene_plans import (
        _shared_docs,
        uncache_shared_docs,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    sf_dir = str(tmp_path)
    src = table(spark, SF, "documents")
    src.where(F.col("doc_id") < 100).coalesce(1).write.parquet(
        os.path.join(sf_dir, "_tmp1")
    )
    part = [f for f in os.listdir(os.path.join(sf_dir, "_tmp1"))
            if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(sf_dir, "_tmp1", part),
                os.path.join(sf_dir, "documents.parquet"))
    try:
        a = _shared_docs(spark, sf_dir)
        assert a.count() == 100
        assert _shared_docs(spark, sf_dir) is a  # cache hit
        # overwrite with a bigger corpus; ensure a newer mtime
        src.where(F.col("doc_id") < 250).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf_dir, "_tmp2"))
        part2 = [f for f in os.listdir(os.path.join(sf_dir, "_tmp2"))
                 if f.endswith(".parquet")][0]
        _time.sleep(0.05)
        shutil.copy(os.path.join(sf_dir, "_tmp2", part2),
                    os.path.join(sf_dir, "documents.parquet"))
        os.utime(os.path.join(sf_dir, "documents.parquet"))
        b = _shared_docs(spark, sf_dir)
        assert b is not a
        assert b.count() == 250
    finally:
        uncache_shared_docs()


def test_shared_docs_cache_is_thread_safe_and_tolerates_dead_entries(spark):
    """r9 (r8 advisor): concurrent FIRST calls must not double-persist
    (one frame would leak with no owner), and uncache must survive
    entries whose session has since been stopped."""
    import threading

    from lakehouse_file_format_compare_spark.plans import hygiene_plans as hp

    hp.uncache_shared_docs()
    results, errs = [], []

    def grab():
        try:
            results.append(hp._shared_docs(spark, SF))
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    threads = [threading.Thread(target=grab) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(results) == 6
    assert all(r is results[0] for r in results), "racing calls got different frames"
    assert len(hp._SHARED_DOCS) == 1

    # a dead entry (fabricated: object whose unpersist raises) must
    # not break uncache for the healthy ones
    class _Dead:
        def unpersist(self):
            raise RuntimeError("SparkContext was shut down")

    hp._SHARED_DOCS[(0, "/nonexistent")] = (0.0, _Dead())
    hp.uncache_shared_docs()  # must not raise
    assert not hp._SHARED_DOCS
