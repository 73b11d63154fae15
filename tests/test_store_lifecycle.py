"""Signature-store retention/compaction (operators/lifecycle.py, r10
verdict #3): the managed folds equal the unmanaged folds (== one full
run) when nothing is compacted; a finite horizon keeps verdicts exact
within the retention window; the chain counterexample demonstrates
the documented divergence on BOTH sides; and the store size is
bounded (kept + horizon-window tombstones) where the unmanaged store
grows with every batch ever seen — the scale contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    full_minhash_est_dedup,
    full_semantic_dedup_ordered,
    incremental_embedding_dedup,
)
from lakehouse_file_format_compare_spark.operators.lifecycle import (
    compact_store,
    incremental_embedding_dedup_managed,
    incremental_minhash_dedup_managed,
    incremental_semantic_dedup_managed,
    store_lifecycle_report,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.5
SPLIT = 250


@pytest.fixture(scope="module")
def corpus(spark):
    """Same planted-duplicate sf0.001 corpus as
    tests/test_incremental_dedup.py."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    donors = docs.select(
        (F.col("doc_id") + SPLIT).alias("doc_id"),
        F.col("text").alias("__donor"),
    )
    return (
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
        .cache()
    )


def _kept_ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


def test_managed_minhash_no_compaction_equals_full_run(spark, corpus):
    """horizon=None and horizon >= #batches are both EXACTLY the full
    run (the unmanaged guarantee carries over verbatim)."""
    b1 = corpus.where(F.col("doc_id") < SPLIT)
    b2 = corpus.where(F.col("doc_id") >= SPLIT)
    full = _kept_ids(full_minhash_est_dedup(corpus, threshold=THRESHOLD))
    for horizon in (None, 10):
        k1, store = incremental_minhash_dedup_managed(
            b1, None, batch_id=1, horizon=horizon, threshold=THRESHOLD
        )
        k2, store = incremental_minhash_dedup_managed(
            b2, store, batch_id=2, horizon=horizon, threshold=THRESHOLD
        )
        assert _kept_ids(k1) | _kept_ids(k2) == full
        rep = store_lifecycle_report(store).collect()[0]
        assert rep.store_rows == rep.kept_rows + rep.tombstone_rows
        assert rep.oldest_batch == 1 and rep.newest_batch == 2
        # every tokenful doc is indexed — nothing was compacted
        n_tokenful = corpus.where(
            F.length(F.trim("text")) > 0
        ).count()
        assert rep.store_rows == n_tokenful


def test_managed_embedding_matches_unmanaged(spark):
    """LSH embedding path: managed fold (horizon=None) returns the
    same kept set and same store contents as the unmanaged fold."""
    emb = (
        table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 200)
        .cache()
    )
    b1 = emb.where(F.col("vec_id") < 100)
    b2 = emb.where(F.col("vec_id") >= 100)
    uk1, ustore = incremental_embedding_dedup(b1, None)
    uk2, ustore = incremental_embedding_dedup(b2, ustore)
    mk1, mstore = incremental_embedding_dedup_managed(b1, None, batch_id=1)
    mk2, mstore = incremental_embedding_dedup_managed(b2, mstore, batch_id=2)
    assert _kept_ids(mk1, "vec_id") == _kept_ids(uk1, "vec_id")
    assert _kept_ids(mk2, "vec_id") == _kept_ids(uk2, "vec_id")
    assert mstore.count() == ustore.count()
    assert set(mstore.columns) == {"vid", "vec", "buckets", "batch_id", "kept"}


def _vec(theta_deg, dim=8):
    t = math.radians(theta_deg)
    return [math.cos(t), math.sin(t)] + [0.0] * (dim - 2)


def test_semantic_chain_counterexample_both_sides(spark):
    """The documented horizon divergence, deterministically (frozen
    single centroid => guaranteed bucket collision; exact cosine
    verification => no LSH recall noise).

    A at 0deg, B at 18deg, C at 36deg: cos(A,B)=cos(B,C)=0.951 >=
    0.95, cos(A,C)=0.809 < 0.95. B drops as a dup of A in batch 1.
    C (batch 3) matches ONLY B — a fold-dropped doc:
    - horizon=None (and full run): B's tombstone is indexed => C drops;
    - horizon=1: B's tombstone was compacted after batch 2 => C is
      kept — the exact, documented weaker guarantee."""
    dim = 8
    centroids = [[1.0] + [0.0] * (dim - 1)]
    A = (1, _vec(0, dim))
    B = (2, _vec(18, dim))
    D = (3, [0.0, 0.0, 1.0] + [0.0] * (dim - 3))  # far from everything
    C = (4, _vec(36, dim))
    schema = "vec_id long, embedding array<double>"
    b1 = spark.createDataFrame([A, B], schema)
    b2 = spark.createDataFrame([D], schema)
    b3 = spark.createDataFrame([C], schema)
    allv = spark.createDataFrame([A, B, D, C], schema)

    full = _kept_ids(
        full_semantic_dedup_ordered(allv, centroids, threshold=0.95),
        "vec_id",
    )
    assert full == {1, 3}  # B and C both dropped by the full run

    def fold(horizon):
        kept = set()
        store = None
        for i, b in enumerate([b1, b2, b3], start=1):
            k, store = incremental_semantic_dedup_managed(
                b, store, centroids, batch_id=i, horizon=horizon,
                threshold=0.95,
            )
            kept |= _kept_ids(k, "vec_id")
        return kept, store

    kept_exact, store_exact = fold(None)
    assert kept_exact == full
    kept_h1, store_h1 = fold(1)
    assert kept_h1 == {1, 3, 4}  # C survives: its only match aged out
    rep = store_lifecycle_report(store_h1).collect()[0]
    # B's tombstone compacted; C is kept so no new tombstone
    assert rep.tombstone_rows == 0
    assert rep.kept_rows == 3


def test_store_size_bounded_scale_contract(spark):
    """Stationary drop rate: unmanaged store grows with every doc ever
    seen; managed store is bounded at kept + horizon-window
    tombstones — exact counts, every batch. Exact one-hot duplicates
    (cosine 1.0) keep the drops deterministic."""
    dim = 16
    n_unique = 7
    per_batch = 10
    horizon = 2
    centroids = [[1.0 / math.sqrt(dim)] * dim]
    schema = "vec_id long, embedding array<double>"

    def batch(t):
        rows = []
        for j in range(per_batch):
            vid = t * per_batch + j
            vec = [0.0] * dim
            vec[vid % n_unique] = 1.0
            rows.append((vid, vec))
        return spark.createDataFrame(rows, schema)

    store = None
    kept_total = 0
    for t in range(6):
        k, store = incremental_semantic_dedup_managed(
            batch(t), store, centroids, batch_id=t, horizon=horizon,
            threshold=0.95,
        )
        kept_total += k.count()
        rep = store_lifecycle_report(store).collect()[0]
        # batch 0 keeps one doc per unique vector; every later doc is
        # an exact dup of a kept batch-0 doc => dropped
        want_kept = n_unique
        want_tomb = sum(
            (per_batch - n_unique) if u == 0 else per_batch
            for u in range(t + 1)
            if u > t - horizon
        )
        assert kept_total == want_kept
        assert rep.kept_rows == want_kept
        assert rep.tombstone_rows == want_tomb
        # the bound that matters at crawl scale
        assert rep.store_rows <= want_kept + horizon * per_batch
    # unmanaged comparison: same fold without compaction ends at
    # every-doc-ever-seen
    ustore = None
    for t in range(6):
        _, ustore = incremental_embedding_dedup(batch(t), ustore, dim=dim)
    assert ustore.count() == 6 * per_batch


def test_compact_store_validates_horizon(spark):
    managed = spark.createDataFrame(
        [(1, True, 1)], "doc long, kept boolean, batch_id long"
    )
    with pytest.raises(ValueError):
        compact_store(managed, 3, 0)
    assert compact_store(managed, 3, None) is managed
