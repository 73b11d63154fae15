"""Distributed k-means (Lloyd's algorithm) over the embedding column
— the missing TRAINER next to the frozen-centroid consumers
(SemDeDup in operators/dedup.py, IVF bucketing in
operators/similarity.py train on bounded driver-side samples; this
is the full-corpus distributed iteration those centroids graduate to
at scale).

Exact integer arithmetic end to end (the fixed-point discipline from
operators/pagerank.py / operators/divergence.py), so every
assignment, every centroid and the final inertia are bit-identical
on Spark and DuckDB and invariant to partition layout:

- vectors are snapped ONCE to an integer MICRO grid
  (``floor(x * 1e6 + 0.5)`` per component — float->double is exact,
  the multiply/floor are the same IEEE ops on both engines);
- squared L2 distances are LONG sums of LONG squared diffs
  (dim 64 x (2e6)^2 ~ 2.6e14 per distance — no overflow);
- the argmin is the ENCODED integer min ``min_j(d_j * 1024 + j)``
  (ties break to the lowest cluster id by construction; decode via
  ``>> 10`` / ``& 1023`` — pure bit ops, so no double division
  anywhere);
- centroid updates are ``floor(sum / count)`` with the sum carried
  exactly in a double (component sums stay far below 2^53 — see the
  scale note) — the same expression the SQL replay runs;
- init is deterministic: the k lowest-id vectors are the seeds
  (replayable as ``WHERE vec_id < k``).

Scale shape (100 TB):
- the snapped corpus is ONE projection of the input (cache/persist
  it across iterations upstream if the source scan is expensive);
- per iteration: one corpus scan computing k JVM ``aggregate`` folds
  per row (centroids ride the plan as LITERAL arrays — no broadcast
  exchange, no join), then one posexplode + groupBy(cluster, dim)
  whose map-side combine reduces the shuffle to
  partitions x k x dim rows;
- each iteration's plan reads the source directly (centroids are
  literals), so lineage does NOT grow with iterations — no
  checkpoint needed, unlike recurrences whose next state is a
  DataFrame;
- the per-iteration driver collect is k x dim LONGs (bounded
  metadata, the sanctioned class from the r8 collect audit);
- centroid component sums are exact in doubles while
  cluster_size x 2e6 < 2^53, i.e. up to ~4.5e9 members per cluster;
  beyond that swap the mean for a LONG-sum + integer floor-div pair
  (one line) at the cost of a slightly hairier SQL replay.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no clustering surface (dags/ are format-comparison ETL);
extension surface per the training-data-pipeline brief (SURVEY §2
extensions — similarity/clustering family; Lloyd 1982, and the
SemDeDup pipeline of Abbas et al. 2023 consumes exactly these
centroids).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

#: argmin encoding base: distances are shifted left 10 bits and the
#: cluster id packed in the low bits, so k is capped at 1024.
ENC_BITS = 10
ENC = 1 << ENC_BITS

DEFAULT_K = 8
DEFAULT_ITERS = 3


def snap_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, v: array<long>) — components snapped to the MICRO grid."""
    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("v"),
    )


def _enc_min(centroids: dict[int, list[int]]):
    """Column: min over clusters of (squared-L2 dist * ENC + j)."""
    terms = []
    for j in sorted(centroids):
        cj = F.array(*[F.lit(int(c)) for c in centroids[j]])
        d = F.aggregate(
            F.zip_with(F.col("v"), cj, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        terms.append(d * ENC + F.lit(j))
    return F.array_min(F.array(*terms))


def assign_clusters(
    snapped: DataFrame, centroids: dict[int, list[int]], id_col: str = "vec_id"
) -> DataFrame:
    """(id, cluster, dist) under the given centroids — one scan, no
    join (centroids are literals), exact integer argmin."""
    enc = _enc_min(centroids)
    return snapped.select(
        id_col,
        "v",
        enc.alias("__enc"),
    ).select(
        id_col,
        "v",
        F.col("__enc").bitwiseAND(F.lit(ENC - 1)).cast("int").alias("cluster"),
        F.shiftright(F.col("__enc"), ENC_BITS).alias("dist"),
    )


def kmeans_pp_seeds(
    emb: DataFrame,
    k: int,
    sample_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[int]]:
    """Seeded k-means++ seeding on a bounded driver-side sample (the
    ``train_ivf_centroids`` discipline: sample = the ``sample_size``
    smallest ids via TakeOrderedAndProject, so seeds are
    deterministic under any partition layout) — the production init
    for :func:`kmeans_fit` at scale, where ``init='first-k'`` can
    plant every seed inside one dense region and waste iterations.

    Exact D^2 sampling on the MICRO grid: distances are the same
    integer squared-L2 the fit uses, and the "random" proportional
    draw is a seeded deterministic fold (cumulative-sum threshold at
    ``(seed * 2654435761 % 2^32) / 2^32`` of the total — splitmix-
    style, reproducible everywhere). Returns MICRO-grid centroids
    keyed 0..k-1, ready to pass as ``init_centroids``.
    """
    rows = (
        snap_vectors(emb, id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("empty input")
    pts = [[int(x) for x in r.v] for r in rows]
    seeds = [pts[0]]
    state = seed & 0xFFFFFFFF
    while len(seeds) < min(k, len(pts)):
        d2 = [
            min(
                sum((a - b) * (a - b) for a, b in zip(p, s))
                for s in seeds
            )
            for p in pts
        ]
        total = sum(d2)
        if total == 0:
            break
        # deterministic multiplicative-hash draw in [0, 1)
        state = (state * 2654435761 + 1) & 0xFFFFFFFF
        thresh = (state / 4294967296.0) * total
        acc = 0
        pick = 0
        for i, d in enumerate(d2):
            acc += d
            if acc > thresh:
                pick = i
                break
        seeds.append(pts[pick])
    return {j: s for j, s in enumerate(seeds)}


def kmeans_fit(
    emb: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: dict[int, list[int]] | None = None,
):
    """Run ``iters`` Lloyd iterations; returns
    ``(centroids, assignments)`` where ``centroids`` is
    ``{cluster: [int components]}`` on the MICRO grid and
    ``assignments`` is the FINAL (id, cluster, dist) frame (lazy).

    Init: the k lowest-id vectors by default (replayable in SQL as
    ``WHERE id < k`` — the oracle contract), or pass
    ``init_centroids`` (e.g. :func:`kmeans_pp_seeds` for the
    production D^2 seeding; the iteration arithmetic stays exactly
    replayable GIVEN the seeds).

    A cluster that loses all members drops out (both engines lose it
    identically — the SQL replay's update join simply yields no rows
    for it)."""
    if not 0 < k <= ENC:
        raise ValueError(f"k must be in (0, {ENC}]")
    snapped = snap_vectors(emb, id_col, vec_col)
    # persist across the iteration collects only; the FINAL
    # assignment frame re-derives from the source so no cached block
    # outlives the fit (each iteration is a bounded k x dim collect)
    cached = snapped.persist()
    try:
        if init_centroids is not None:
            centroids = {int(j): [int(x) for x in v]
                         for j, v in init_centroids.items()}
        else:
            init = cached.where(F.col(id_col) < k).orderBy(id_col).collect()
            if not init:
                raise ValueError("no seed vectors with id < k")
            centroids = {int(r[id_col]): [int(x) for x in r.v] for r in init}
        dim = len(next(iter(centroids.values())))
        for _ in range(iters):
            sums = (
                assign_clusters(cached, centroids, id_col)
                .select("cluster", F.posexplode("v").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(
                    F.sum("val").cast("long").alias("s"),
                    F.count(F.lit(1)).cast("long").alias("n"),
                )
                .collect()
            )
            nxt: dict[int, list[int]] = {}
            for r in sums:
                # floor(double_sum / count): mirrors the SQL replay's
                # floor(CAST(s AS DOUBLE) / n) bit for bit (s < 2^53)
                nxt.setdefault(r.cluster, [0] * dim)[r.pos] = math.floor(
                    r.s / r.n
                )
            centroids = nxt
    finally:
        cached.unpersist()
    assignments = assign_clusters(snapped, centroids, id_col).drop("v")
    return centroids, assignments


def kmeans_report(
    emb: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row of exact LONG k-means facts:

    - ``km_k`` / ``km_iters`` / ``km_points`` — run shape;
    - ``km_clusters`` — non-empty clusters after the last update;
    - ``km_inertia`` — LONG sum of final squared distances (micro^2);
    - ``km_sizes_fp`` — ``sum(cluster + 1)`` over points (any size
      moving between clusters shifts it);
    - ``km_assign_fp`` — ``sum((id % 97) * (cluster + 1))`` (any
      single point reassigned shifts it);
    - ``km_centroid_fp`` — ``sum((j*dim + pos + 1) * component)``
      over the final centroid grid (computed from the fitted
      centroids; the oracle recomputes it from scratch).
    """
    centroids, assignments = kmeans_fit(emb, k, iters, id_col, vec_col)
    dim = len(next(iter(centroids.values())))
    cfp = sum(
        (j * dim + pos + 1) * comp
        for j, comps in centroids.items()
        for pos, comp in enumerate(comps)
    )
    return assignments.agg(
        F.lit(int(k)).cast("long").alias("km_k"),
        F.lit(int(iters)).cast("long").alias("km_iters"),
        F.count(F.lit(1)).cast("long").alias("km_points"),
        F.count_distinct(F.col("cluster")).cast("long").alias("km_clusters"),
        F.sum("dist").cast("long").alias("km_inertia"),
        F.sum(F.col("cluster") + 1).cast("long").alias("km_sizes_fp"),
        F.sum((F.col(id_col) % 97) * (F.col("cluster") + 1))
        .cast("long")
        .alias("km_assign_fp"),
        F.lit(int(cfp)).cast("long").alias("km_centroid_fp"),
    )
