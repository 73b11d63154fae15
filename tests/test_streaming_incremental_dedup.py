"""Streaming incremental dedup vs a persistent signature store
(streaming/dedup_store_stream.py, r10): draining id-ordered document
files one micro-batch at a time must produce EXACTLY the one-shot
full-run kept set (the batch-fold theorem lifted to Structured
Streaming); the store indexes every seen doc; replaying the whole
source against the committed tables is a no-op (idempotent
insert-only merges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    full_minhash_est_dedup,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import (
    StreamingIncrementalDedupLoader,
)
from tests.conftest import SF_SMOKE

THRESHOLD = 0.5
CUTS = [(0, 170), (170, 340), (340, 500)]


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 documents with planted cross-batch duplicates (the
    test_incremental_dedup fixture): every doc with doc_id >= 250 and
    doc_id % 5 == 1 carries the text of doc_id - 250."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    donors = docs.select(
        (F.col("doc_id") + 250).alias("doc_id"), F.col("text").alias("__d")
    )
    return (
        docs.join(donors, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") >= 250)
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
def drained(spark, corpus, tmp_path_factory):
    """Write the corpus as 3 id-ordered parquet files, drain them with
    maxFilesPerTrigger=1 (3 real micro-batches), return the roots."""
    src = str(tmp_path_factory.mktemp("dedup_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    root = str(tmp_path_factory.mktemp("dedup_wh"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    loader = StreamingIncrementalDedupLoader(
        Warehouse(spark, root), ckpt, threshold=THRESHOLD
    )
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    loader.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    return loader, src, schema


def _kept_ids(wh):
    return sorted(
        r.doc_id for r in wh.read_table("silver", "docs").select("doc_id").collect()
    )


def test_drain_equals_full_run(spark, corpus, drained):
    loader, _, _ = drained
    stream_kept = _kept_ids(loader.warehouse)
    full_kept = sorted(
        r.doc_id
        for r in full_minhash_est_dedup(corpus, threshold=THRESHOLD)
        .select("doc_id")
        .collect()
    )
    assert stream_kept == full_kept
    assert len(stream_kept) < corpus.count()  # something was dropped


def test_store_indexes_every_seen_doc(spark, corpus, drained):
    loader, _, _ = drained
    store = loader.warehouse.read_table("silver", "docs_sigstore")
    assert store.count() == corpus.count()
    assert {r.doc for r in store.select("doc").collect()} == {
        r.doc_id for r in corpus.select("doc_id").collect()
    }


def test_replay_is_idempotent(spark, corpus, drained):
    """A fresh checkpoint re-delivers every file; the keyed
    insert-only merges must leave both tables bit-identical (the
    effectively-once contract)."""
    loader, src, schema = drained
    wh = loader.warehouse
    before_kept = _kept_ids(wh)
    before_store = wh.read_table("silver", "docs_sigstore").count()
    import tempfile

    replay = StreamingIncrementalDedupLoader(
        wh, tempfile.mkdtemp(prefix="dedup_ckpt_replay"), threshold=THRESHOLD
    )
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    assert _kept_ids(wh) == before_kept
    assert wh.read_table("silver", "docs_sigstore").count() == before_store


def test_planted_duplicates_never_kept(spark, corpus, drained):
    loader, _, _ = drained
    planted = {
        r.doc_id
        for r in corpus.where(
            (F.col("doc_id") >= 250) & (F.pmod("doc_id", F.lit(5)) == 1)
        ).collect()
    }
    assert planted
    assert not (planted & set(_kept_ids(loader.warehouse)))


@pytest.fixture(scope="module")
def vec_drained(spark, tmp_path_factory):
    """Planted embeddings (the test_incremental_embedding fixture)
    written as 3 id-ordered files and drained by the embedding
    loader, one file per micro-batch."""
    from lakehouse_file_format_compare_spark.streaming import (
        StreamingEmbeddingDedupLoader,
    )

    emb = table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    donors = emb.select(
        (F.col("vec_id") + 250).alias("vec_id"), F.col("embedding").alias("__d")
    )
    planted = (
        emb.join(donors, "vec_id", "left")
        .select(
            "vec_id",
            F.when(
                (F.col("vec_id") >= 250)
                & (F.pmod("vec_id", F.lit(5)) == 1)
                & F.col("__d").isNotNull(),
                F.col("__d"),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
        .cache()
    )
    src = str(tmp_path_factory.mktemp("vec_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            planted.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    root = str(tmp_path_factory.mktemp("vec_wh"))
    ckpt = str(tmp_path_factory.mktemp("vec_ckpt"))
    loader = StreamingEmbeddingDedupLoader(Warehouse(spark, root), ckpt)
    schema = planted.schema
    loader.run(f"{src}/batch_*", "vecs", schema, max_files_per_trigger=1)
    return loader, planted


def test_horizon_drain_compacts_and_stays_exact_in_window(spark, corpus, tmp_path_factory):
    """r11 retention mode (operators/lifecycle.py lifted to the
    stream): with horizon=1 over the 3-batch drain, every planted
    duplicate still drops (its donor is KEPT — kept rows are never
    compacted), the store ends strictly smaller than every-doc-ever,
    no out-of-horizon tombstone survives, and a replay against the
    committed tables is still a no-op."""
    src = str(tmp_path_factory.mktemp("hdedup_src"))
    for i, (lo, hi) in enumerate(CUTS):
        (
            corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/batch_{i}")
        )
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("hdedup_wh")))
    loader = StreamingIncrementalDedupLoader(
        wh, str(tmp_path_factory.mktemp("hdedup_ckpt")),
        threshold=THRESHOLD, horizon=1,
    )
    schema = spark.createDataFrame([], "doc_id long, text string").schema
    loader.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)

    kept = set(_kept_ids(wh))
    store = wh.read_table("silver", "docs_sigstore")
    assert set(store.columns) == {"doc", "signature", "batch_id", "kept"}
    n_all = corpus.where(F.length(F.trim("text")) > 0).count()
    assert store.count() < n_all  # compaction actually pruned
    # no dropped-doc row older than the horizon (final batch_id is 2)
    assert store.where(
        (~F.col("kept")) & (F.col("batch_id") <= 2 - 1)
    ).count() == 0
    # every kept doc is indexed forever
    assert store.where(F.col("kept")).count() == len(
        kept & {r.doc for r in store.select("doc").collect()}
    )
    # planted dups (donors in batch 0, copies in batches 1-2 at
    # id >= 250) still always drop: donors are kept rows
    donors_kept = {
        r.doc_id for r in corpus.where(F.col("doc_id") < 250).collect()
    } & kept
    planted = {
        r.doc_id
        for r in corpus.where(
            (F.col("doc_id") >= 250) & (F.pmod("doc_id", F.lit(5)) == 1)
        ).collect()
        if r.doc_id - 250 in donors_kept
    }
    assert planted and not (planted & kept)
    # replay: fresh checkpoint, same tables — bit-identical
    import tempfile

    before_kept = _kept_ids(wh)
    before_store = store.count()
    replay = StreamingIncrementalDedupLoader(
        wh, tempfile.mkdtemp(prefix="hdedup_ckpt_replay"),
        threshold=THRESHOLD, horizon=1,
    )
    replay.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
    assert _kept_ids(wh) == before_kept
    assert wh.read_table("silver", "docs_sigstore").count() == before_store


def test_embedding_drain_equals_full_run(spark, vec_drained):
    from lakehouse_file_format_compare_spark.operators.dedup import (
        full_embedding_est_dedup,
    )

    loader, planted = vec_drained
    stream_kept = sorted(
        r.vec_id
        for r in loader.warehouse.read_table("silver", "vecs")
        .select("vec_id")
        .collect()
    )
    full_kept = sorted(
        r.vec_id
        for r in full_embedding_est_dedup(planted, threshold=0.95)
        .select("vec_id")
        .collect()
    )
    assert stream_kept == full_kept
    assert len(stream_kept) < planted.count()


def test_embedding_store_indexes_every_seen_vector(spark, vec_drained):
    loader, planted = vec_drained
    store = loader.warehouse.read_table("silver", "vecs_vecstore")
    assert store.count() == planted.count()


def test_horizon_toggle_against_existing_store_raises(
    spark, corpus, drained, tmp_path_factory
):
    """r11 advice: `horizon` cannot change for an existing signature
    store — managed stores carry (batch_id, kept), unmanaged ones
    don't, and mixing row shapes fails late with an opaque schema
    error. The first micro-batch raises a descriptive one instead."""
    loader, src, schema = drained  # unmanaged store already on disk
    managed = StreamingIncrementalDedupLoader(
        loader.warehouse,
        str(tmp_path_factory.mktemp("toggle_ckpt")),
        threshold=THRESHOLD,
        horizon=1,
    )
    with pytest.raises(Exception, match="horizon"):
        managed.run(f"{src}/batch_*", "docs", schema, max_files_per_trigger=1)
