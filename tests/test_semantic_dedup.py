"""SemDeDup-style semantic dedup (operators/dedup.py::
semantic_near_dup_pairs / semantic_dedup): exact-set behavior on
planted clones, precision/recall vs the brute-force baseline on
perturbed copies, canonicalization, determinism across partition
layout, the Σ cluster² cost bound, and a plan sweep."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    embedding_near_dup_pairs,
    semantic_dedup,
    semantic_near_dup_pairs,
)
from lakehouse_file_format_compare_spark.operators.similarity import (
    train_ivf_centroids,
)

from .conftest import SF_CORRECTNESS

THRESHOLD = 0.95
N_COPIES = 30
CLONE_OFFSET = 100_000
N_LISTS = 16
EPS = 0.02


def _base():
    t = pq.read_table(os.path.join(SF_CORRECTNESS, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    vecs = t["embedding"].to_pylist()
    return ids, vecs


def _write(tmp_path_factory, name, ids, vecs):
    path = str(tmp_path_factory.mktemp(name) / "embeddings.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }),
        path,
    )
    return path


@pytest.fixture(scope="module")
def clone_fixture(tmp_path_factory):
    """Exact clones: identical vectors ALWAYS share a cluster, so the
    true pair set at 0.95 is exactly the planted (i, i+offset) pairs
    (raw sf0.01 max natural cosine is 0.513)."""
    ids, vecs = _base()
    cids = ids[:N_COPIES]
    path = _write(
        tmp_path_factory, "semclone",
        np.concatenate([ids, cids + CLONE_OFFSET]),
        vecs + [vecs[i] for i in range(N_COPIES)],
    )
    return path, {(int(i), int(i) + CLONE_OFFSET) for i in cids}


@pytest.fixture(scope="module")
def perturbed_fixture(tmp_path_factory):
    ids, vecs = _base()
    cids = ids[:N_COPIES]
    base = np.array(vecs[:N_COPIES], dtype=np.float32)
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(base.shape).astype(np.float32)
    pert = base * (1.0 + EPS * noise / np.linalg.norm(noise, axis=1, keepdims=True))
    path = _write(
        tmp_path_factory, "sempert",
        np.concatenate([ids, cids + CLONE_OFFSET]),
        vecs + [list(map(float, v)) for v in pert],
    )
    return path, {(int(i), int(i) + CLONE_OFFSET) for i in cids}


def _load(spark, path):
    return spark.read.parquet(path)


def test_clone_pairs_exact_set(spark, clone_fixture):
    path, expected = clone_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    got = semantic_near_dup_pairs(emb, cents, threshold=THRESHOLD).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == expected
    # exact clones: grid-6 cosine is exactly 1.0
    assert all(r["cosine"] == 1.0 for r in got)


def test_precision_and_recall_vs_bruteforce(spark, perturbed_fixture):
    path, expected = perturbed_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    sem = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_near_dup_pairs(emb, cents, threshold=THRESHOLD).collect()
    }
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, threshold=THRESHOLD).collect()
    }
    # precision 1.0 by construction: subset with matching values
    # (semantic scores via the Arrow reduction, brute via the JVM HOF
    # fold — sum-order ulp drift can move a grid-6 snap by one step)
    for pair, cos in sem.items():
        assert pair in brute and brute[pair] == pytest.approx(cos, abs=1.5e-6)
    # recall: near-identical copies assign with their originals
    assert len(sem) >= 0.9 * len(brute)
    assert set(brute) == expected  # fixture sanity: true set known


def test_semantic_dedup_keeps_originals(spark, clone_fixture):
    path, _ = clone_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    out = semantic_dedup(emb, cents, threshold=THRESHOLD)
    kept = [r["vec_id"] for r in out.where("is_canonical").collect()]
    n_base = emb.count() - N_COPIES
    # min-id representative: every original survives, every clone drops
    assert len(kept) == n_base
    assert all(k < CLONE_OFFSET for k in kept)
    # canonical of each clone is its original
    clones = out.where(~F.col("is_canonical")).collect()
    assert len(clones) == N_COPIES
    assert all(r["canonical_id"] == r["vec_id"] - CLONE_OFFSET for r in clones)


def test_deterministic_across_partitioning(spark, perturbed_fixture):
    path, _ = perturbed_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    a = sorted(
        map(tuple, semantic_near_dup_pairs(emb, cents, threshold=THRESHOLD).collect())
    )
    b = sorted(
        map(
            tuple,
            semantic_near_dup_pairs(
                emb.repartition(7), cents, threshold=THRESHOLD
            ).collect(),
        )
    )
    assert a == b


def test_cluster_volume_bound(spark, clone_fixture):
    """The point of clustering: Σ cluster-pair volume ≪ C(n,2)."""
    from lakehouse_file_format_compare_spark.operators.similarity import ivf_assign

    path, _ = clone_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    sizes = [
        r["n"]
        for r in ivf_assign(
            emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("vec")),
            cents, "vec",
        ).groupBy("__list").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    n = sum(sizes)
    vol = sum(s * (s - 1) // 2 for s in sizes)
    assert vol <= 0.5 * n * (n - 1) // 2


def test_max_cluster_size_caps_work(spark, clone_fixture):
    path, _ = clone_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    # a cap below every cluster size drops all candidates
    assert semantic_near_dup_pairs(
        emb, cents, threshold=THRESHOLD, max_cluster_size=1
    ).count() == 0


def test_plan_shape(spark, clone_fixture):
    path, _ = clone_fixture
    emb = _load(spark, path)
    cents = train_ivf_centroids(emb, n_lists=N_LISTS)
    df = semantic_near_dup_pairs(emb, cents, threshold=THRESHOLD)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # Arrow-batched assignment only


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    cents = [[1.0] * 4, [0.0, 1.0, 0.0, 1.0]]
    assert semantic_near_dup_pairs(empty, cents).count() == 0
    out = semantic_dedup(empty, cents)
    assert out.count() == 0
    assert {"canonical_id", "is_canonical"} <= set(out.columns)
