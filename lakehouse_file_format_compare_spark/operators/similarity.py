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
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose signature
    hamming-distance from the query signature is ≤ 1 (bucket + 1-probe
    multiprobe), ranked by exact cosine within candidates."""
    planes = _hyperplanes(dim, bits, seed)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "qsig", lsh_signature(F.col("qv"), planes)
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).withColumn(
        "csig", lsh_signature(F.col("cv"), planes)
    )
    # query probes: own bucket + each 1-bit flip
    probe_sigs = F.array(
        F.col("qsig"), *[F.col("qsig").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i)) for i in range(bits)]
    )
    q_probed = q.withColumn("probe", F.explode(probe_sigs))
    scored = (
        q_probed.join(c, F.col("probe") == F.col("csig"))
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
