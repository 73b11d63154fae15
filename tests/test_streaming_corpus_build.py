"""Streaming corpus build (streaming/corpus_build_stream.py): a real
AvailableNow drain of the document stream must produce exactly the
one-shot batch fold — kept docs, stores, splits, packs, datasheet —
and replaying the source must be a no-op (keyed insert-only merges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.corpus_fold import (
    corpus_fold_batch,
    fold_datasheet,
    fold_splits,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import (
    StreamingCorpusBuildLoader,
)
from tests.conftest import SF_SMOKE

CUTS = [(0, 170), (170, 340), (340, 500)]
WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def corpus(spark):
    """Planted cross-batch duplicates: doc_id >= 340, %5 == 1 carries
    the text of doc_id - 340 (the test_corpus_fold fixture)."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
    donors = docs.select(
        (F.col("doc_id") + 340).alias("doc_id"), F.col("text").alias("__d")
    )
    return (
        docs.join(donors, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.when(
                (F.col("doc_id") >= 340)
                & (F.pmod("doc_id", F.lit(5)) == 1)
                & F.col("__d").isNotNull(),
                F.col("__d"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def frozen(spark, corpus):
    from lakehouse_file_format_compare_spark.operators.lm import bigram_lm_train

    model = tuple(
        f.localCheckpoint(eager=False)
        for f in bigram_lm_train(corpus.where(F.col("lang") == "en"))
    )
    eval_docs = (
        corpus.orderBy("doc_id").limit(20).select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    return model, eval_docs


@pytest.fixture(scope="module")
def drained(spark, corpus, frozen, tmp_path_factory):
    model, eval_docs = frozen
    src = str(tmp_path_factory.mktemp("cb_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    loader = StreamingCorpusBuildLoader(
        Warehouse(spark, str(tmp_path_factory.mktemp("cb_wh"))),
        str(tmp_path_factory.mktemp("cb_ckpt")),
        lm_model=model,
        eval_docs=eval_docs,
        weights=WEIGHTS,
    )
    schema = spark.createDataFrame(
        [], "doc_id long, lang string, text string"
    ).schema
    loader.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    return loader, src, schema


@pytest.fixture(scope="module")
def oneshot(spark, corpus, frozen):
    model, eval_docs = frozen
    kept, state = corpus_fold_batch(
        corpus, None, lm_model=model, eval_docs=eval_docs
    )
    return (
        sorted(r.doc_id for r in kept.select("doc_id").collect()),
        state,
    )


def test_drain_equals_batch_fold(spark, drained, oneshot):
    loader, _, _ = drained
    want_ids, _ = oneshot
    got_ids = sorted(
        r.doc_id
        for r in loader.warehouse.read_table("silver", "docs")
        .select("doc_id")
        .collect()
    )
    assert got_ids == want_ids and len(got_ids) > 100


def test_drained_artifacts_equal_batch(spark, drained, oneshot):
    loader, _, _ = drained
    _, state = oneshot
    got = sorted(
        (r.doc_id, r.canonical_id, r.split)
        for r in loader.splits("docs").collect()
    )
    want = sorted(
        (r.doc_id, r.canonical_id, r.split)
        for r in fold_splits(state, WEIGHTS).collect()
    )
    assert got == want and len(got) > 100
    ds_got = sorted(tuple(r) for r in loader.datasheet("docs").collect())
    ds_want = sorted(tuple(r) for r in fold_datasheet(state).collect())
    assert ds_got == ds_want


_TABLES = ("", "__ledger", "__manifest", "__pairs", "__keptsigs",
           "__sigs", "__fps")


def _snapshot(wh):
    out = {}
    for t in _TABLES:
        out[t] = sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in wh.read_table("silver", f"docs{t}").collect()
        )
    return out


def test_crash_replay_converges(spark, corpus, frozen, tmp_path_factory):
    """Kill the micro-batch at EVERY commit boundary (r12 advisor,
    high): after a crash between any two store merges, replaying the
    batch must converge every store and the kept table to the clean
    no-crash run — the reverse-dependency commit order plus the
    batch-id scrub in corpus_fold_batch make each replayed delta
    byte-identical, and the keyed insert-only merges absorb it."""
    import shutil

    _, eval_docs = frozen
    batch_a = corpus.where(F.col("doc_id") < 70).localCheckpoint()
    batch_b = corpus.where(
        (F.col("doc_id") >= 340) & (F.col("doc_id") < 410)
    ).localCheckpoint()

    def loader(root):
        return StreamingCorpusBuildLoader(
            Warehouse(spark, root), root + "_ckpt",
            eval_docs=eval_docs, weights=WEIGHTS,
        )

    # batch A folded once into a base warehouse, copied per scenario
    base = str(tmp_path_factory.mktemp("crash_base"))
    loader(base).fold_batch(batch_a, 0, "docs")
    # the clean reference: batch B folded with no crash
    clean = str(tmp_path_factory.mktemp("crash_clean"))
    shutil.rmtree(clean)
    shutil.copytree(base, clean)
    loader(clean).fold_batch(batch_b, 1, "docs")
    want = _snapshot(Warehouse(spark, clean))
    assert len(want[""]) > 50
    reasons = {r[1] for r in want["__ledger"]}
    assert "exact_duplicate" in reasons  # planted cross-batch dups
    assert "decontaminated" in reasons  # eval fixture overlaps batch A

    for crash_after in range(len(_TABLES)):
        root = str(tmp_path_factory.mktemp(f"crash_{crash_after}"))
        shutil.rmtree(root)
        shutil.copytree(base, root)
        ld = loader(root)
        with pytest.raises(RuntimeError, match="injected crash"):
            ld.fold_batch(batch_b, 1, "docs", _crash_after=crash_after)
        ld.fold_batch(batch_b, 1, "docs")  # the streaming retry
        got = _snapshot(ld.warehouse)
        for t in _TABLES:
            assert got[t] == want[t], (crash_after, t)


def test_replay_is_noop(spark, drained, tmp_path_factory):
    loader, src, schema = drained
    before = {
        suffix: sorted(
            tuple(r)
            for r in loader.warehouse.read_table(
                "silver", f"docs__{suffix}"
            ).collect()
        )
        for suffix in ("fps", "manifest", "pairs")
    }
    replay = StreamingCorpusBuildLoader(
        loader.warehouse,
        str(tmp_path_factory.mktemp("cb_ckpt2")),
        lm_model=loader.lm_model,
        eval_docs=loader.eval_docs,
        weights=WEIGHTS,
    )
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    for suffix, want in before.items():
        got = sorted(
            tuple(r)
            for r in loader.warehouse.read_table(
                "silver", f"docs__{suffix}"
            ).collect()
        )
        assert got == want, suffix
