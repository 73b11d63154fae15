"""Approximate-nearest-neighbor search over embedding columns.

Two strategies sharing the cosine kernel (functions/vectors.py):

- brute-force top-k: query⨯corpus cross join + per-query window
  rank. Exact; cost |Q|·|C| distance evals. The correctness baseline
  and the right choice when |Q| is small (batch lookup joins).
- random-hyperplane LSH buckets: each vector gets a b-bit signature
  (sign of dot with seeded Gaussian hyperplanes); search joins only
  same-bucket (+ optional multi-probe) candidates. At 100 TB this is
  the serving path: bucket join instead of cross join, recall tunable
  via (bits, probes).

Hyperplanes are generated driver-side from a fixed seed (numpy) and
shipped as literal arrays — deterministic across runs and cluster
sizes, no UDF, no state.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.numeric import grid


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Returns
    (query_id, neighbor_id, cosine, rank); excludes self-matches;
    deterministic tie-break on neighbor id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", grid(V.cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.randn(bits, dim)]


def lsh_signature(vec_col, planes: list[list[float]]):
    """b-bit random-hyperplane signature as a long (sign bits)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = V.dot(vec_col, F.array(*[F.lit(p) for p in plane]))
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 6,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via standard multi-table random-hyperplane
    LSH: ``tables`` independent ``bits``-bit signatures; candidates =
    corpus vectors sharing a bucket (or any 1-bit-flip probe bucket)
    with the query in ANY table; exact cosine rank within candidates.

    Recall ≈ 1-(1-p_t)^tables where p_t is the per-table collision
    probability — tunable without touching the query. Cost is the
    bucket-join (candidates only), never |Q|×|C|: the 100 TB serving
    path. With weakly-similar data (cos≈0.3, as in the synthetic
    testdata) use more tables / fewer bits."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 7919 * t)
        q = q.withColumn(f"qsig{t}", lsh_signature(F.col("qv"), planes))
        c = c.withColumn(f"csig{t}", lsh_signature(F.col("cv"), planes))
    # probe buckets per table: own + each 1-bit flip, tagged by table id
    probes = F.array(*[
        F.struct(
            F.lit(t).alias("t"),
            (F.col(f"qsig{t}") if i < 0 else
             F.col(f"qsig{t}").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))).alias("b"),
        )
        for t in range(tables)
        for i in range(-1, bits)
    ])
    q_probed = q.select("query_id", "qv", F.explode(probes).alias("p"))
    buckets = c.select(
        "neighbor_id", "cv",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"csig{t}").alias("b")) for t in range(tables)
        ])).alias("p"),
    )
    scored = (
        q_probed.join(buckets, ["p"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
        .withColumn("cosine", grid(V.cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
