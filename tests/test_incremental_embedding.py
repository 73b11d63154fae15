"""Incremental EMBEDDING dedup (operators/dedup.py, r10 — the
minhash signature-store pattern applied to the semantic path):
folding id-ordered vector batches through the (vid, vec, buckets)
store must EXACTLY equal one full run; planted cross-batch duplicate
vectors are always dropped (identical vectors share every LSH bucket
— deterministic, no recall dial); the store indexes every seen
vector; the semantic (frozen-centroid SemDeDup) variant carries the
same fold contract; plans stay bucket-joined (no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    embedding_signature_store,
    full_embedding_est_dedup,
    full_semantic_dedup_ordered,
    incremental_embedding_dedup,
    incremental_semantic_dedup,
    semantic_store,
)
from lakehouse_file_format_compare_spark.operators.similarity import (
    train_ivf_centroids,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.95
SPLIT = 250  # sf0.001 embeddings: vec_id 0..499; batch1 < 250 <= batch2
PLANT_MOD = 5


@pytest.fixture(scope="module")
def vectors(spark):
    """sf0.001 embeddings with planted cross-batch duplicates: every
    batch-2 vector with vec_id % PLANT_MOD == 1 gets the embedding of
    vec_id - SPLIT (a batch-1 vector whose own embedding is never
    overwritten — donor ids all < SPLIT, outside the plant range)."""
    emb = table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    donors = emb.select(
        (F.col("vec_id") + SPLIT).alias("vec_id"),
        F.col("embedding").alias("__donor"),
    )
    planted = emb.join(donors, "vec_id", "left").select(
        "vec_id",
        F.when(
            (F.col("vec_id") >= SPLIT)
            & (F.pmod(F.col("vec_id"), F.lit(PLANT_MOD)) == 1)
            & F.col("__donor").isNotNull(),
            F.col("__donor"),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    return planted.cache()


def _batches(vectors):
    b1 = vectors.where(F.col("vec_id") < SPLIT)
    b2 = vectors.where(F.col("vec_id") >= SPLIT)
    return b1, b2


def _planted_ids(vectors):
    return {
        r.vec_id
        for r in vectors.where(
            (F.col("vec_id") >= SPLIT)
            & (F.pmod(F.col("vec_id"), F.lit(PLANT_MOD)) == 1)
        ).collect()
    }


def _kept_ids(df):
    return sorted(r.vec_id for r in df.select("vec_id").collect())


def test_incremental_fold_equals_full_run(spark, vectors):
    b1, b2 = _batches(vectors)
    kept1, store1 = incremental_embedding_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_embedding_dedup(b2, store1, threshold=THRESHOLD)
    inc_kept = sorted(_kept_ids(kept1) + _kept_ids(kept2))
    full_kept = _kept_ids(full_embedding_est_dedup(vectors, threshold=THRESHOLD))
    assert inc_kept == full_kept
    assert len(inc_kept) < vectors.count()  # something was actually dropped


def test_planted_cross_batch_duplicates_always_dropped(spark, vectors):
    """Identical vectors => identical hyperplane signs => same bucket
    in every table => candidate => exact cosine 1.0 => dropped."""
    b1, b2 = _batches(vectors)
    _, store1 = incremental_embedding_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_embedding_dedup(b2, store1, threshold=THRESHOLD)
    planted = _planted_ids(vectors)
    assert planted, "fixture must plant duplicates"
    assert not (planted & set(_kept_ids(kept2)))


def test_store_indexes_every_seen_vector(spark, vectors):
    b1, b2 = _batches(vectors)
    kept1, store1 = incremental_embedding_dedup(b1, None, threshold=THRESHOLD)
    kept2, store2 = incremental_embedding_dedup(b2, store1, threshold=THRESHOLD)
    assert store1.count() == b1.count()
    assert store2.count() == vectors.count()
    assert kept1.count() + kept2.count() < store2.count()
    store_ids = {r.vid for r in store2.select("vid").collect()}
    assert store_ids == {r.vec_id for r in vectors.select("vec_id").collect()}


def test_batch_is_signed_exactly_once(spark, vectors):
    """The scale property of the store: batch-2 signs ONLY itself,
    ONCE. The signed batch is lazily localCheckpoint'd inside the
    operator (new_rows feeds four subtrees; without the lineage cut
    the Arrow matmul ran 6x per batch — measured), so the SQL plan of
    the batch-2 result carries ZERO ArrowEvalPython nodes (the single
    signing lives in the checkpointed lineage) and history enters via
    exploded stored longs."""
    b1, b2 = _batches(vectors)
    _, store1 = incremental_embedding_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_embedding_dedup(b2, store1, threshold=THRESHOLD)
    plan = kept2._sc._jvm.PythonSQLUtils.explainString(
        kept2._jdf.queryExecution(), "formatted"
    )
    assert plan.count("ArrowEvalPython") == 0, plan[:2000]


def test_three_batch_fold_equals_full_run(spark, vectors):
    cuts = [(0, 170), (170, 340), (340, 500)]
    store, kept_all = None, []
    for lo, hi in cuts:
        batch = vectors.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        kept, store = incremental_embedding_dedup(batch, store, threshold=THRESHOLD)
        kept_all.extend(_kept_ids(kept))
    full_kept = _kept_ids(full_embedding_est_dedup(vectors, threshold=THRESHOLD))
    assert sorted(kept_all) == full_kept


def test_dropped_vectors_must_stay_indexed(spark):
    """Survivors-only stores do not commute with the full run: v20 is
    a near-dup of dropped v10 but NOT of v10's canonical twin v0
    (cosine is not transitive). Built in the operator's designed
    regime (links at cos 0.96 ≥ 0.95, non-link at cos(2·16.26°) ≈
    0.84 < 0.95): a planar fan e1 → rot(α) → rot(2α) on the 64-dim
    sphere. At θ ≈ 16°, P(some shared table) ≈ 0.98 per link with the
    seeded hyperplanes — the guard skips if this draw misses (the
    minhash chain test's pattern)."""
    import math

    dim = 64
    a = math.radians(16.26)
    v0 = [1.0] + [0.0] * (dim - 1)
    v10 = [math.cos(a), math.sin(a)] + [0.0] * (dim - 2)
    v20 = [math.cos(2 * a), math.sin(2 * a)] + [0.0] * (dim - 2)
    df = spark.createDataFrame(
        [(0, v0), (10, v10), (20, v20)], "vec_id long, embedding array<float>"
    )
    th = 0.95
    full = full_embedding_est_dedup(df, threshold=th)
    if _kept_ids(full) != [0]:
        pytest.skip("LSH draw did not produce the chain fixture")
    b1 = df.where(F.col("vec_id") < 20)
    b2 = df.where(F.col("vec_id") >= 20)
    _, store1 = incremental_embedding_dedup(b1, None, threshold=th)
    kept2, _ = incremental_embedding_dedup(b2, store1, threshold=th)
    assert kept2.count() == 0  # 20 caught via the indexed-but-dropped 10


def test_first_batch_with_none_history_equals_full(spark, vectors):
    kept, store = incremental_embedding_dedup(vectors, None, threshold=THRESHOLD)
    full = full_embedding_est_dedup(vectors, threshold=THRESHOLD)
    assert _kept_ids(kept) == _kept_ids(full)
    assert store.count() == vectors.count()


def test_semantic_fold_equals_full_run(spark, vectors):
    """SemDeDup incrementally: frozen centroids, (vid, vec, cluster)
    store — the fold contract holds because cluster assignment is a
    pure per-vector map."""
    centroids = train_ivf_centroids(vectors, n_lists=8, iters=4)
    b1, b2 = _batches(vectors)
    kept1, store1 = incremental_semantic_dedup(
        b1, None, centroids, threshold=THRESHOLD
    )
    kept2, store2 = incremental_semantic_dedup(
        b2, store1, centroids, threshold=THRESHOLD
    )
    inc_kept = sorted(_kept_ids(kept1) + _kept_ids(kept2))
    full_kept = _kept_ids(
        full_semantic_dedup_ordered(vectors, centroids, threshold=THRESHOLD)
    )
    assert inc_kept == full_kept
    assert store2.count() == vectors.count()
    # planted identical vectors assign to the same nearest centroid,
    # deterministically => same bucket => cosine 1.0 => dropped
    assert not (_planted_ids(vectors) & set(inc_kept))


def test_store_builders_schema(spark, vectors):
    st = embedding_signature_store(vectors.limit(10))
    assert set(st.columns) == {"vid", "vec", "buckets"}
    rows = st.collect()
    assert all(len(r.buckets) == 6 for r in rows)  # one bucket per table
    # per-table offset keeps signature spaces disjoint
    for r in rows:
        for t, b in enumerate(r.buckets):
            assert t * 256 <= b < (t + 1) * 256
    centroids = train_ivf_centroids(vectors, n_lists=8, iters=2)
    ss = semantic_store(vectors.limit(10), centroids)
    assert set(ss.columns) == {"vid", "vec", "buckets"}
    assert all(len(r.buckets) == 1 for r in ss.collect())


def test_plan_is_bucket_joined_no_cartesian(spark, vectors):
    b1, b2 = _batches(vectors)
    _, store1 = incremental_embedding_dedup(b1, None, threshold=THRESHOLD)
    kept2, _ = incremental_embedding_dedup(b2, store1, threshold=THRESHOLD)
    plan = kept2._sc._jvm.PythonSQLUtils.explainString(
        kept2._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # Arrow-batched signatures only
