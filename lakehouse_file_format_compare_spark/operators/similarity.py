"""Approximate-nearest-neighbor search over embedding columns.

Three strategies sharing the cosine kernel (functions/vectors.py):

- brute-force top-k: query⨯corpus cross join + per-query window
  rank. Exact; cost |Q|·|C| distance evals. The correctness baseline
  and the right choice when |Q| is small (batch lookup joins).
- multi-table random-hyperplane LSH: per-table b-bit sign signatures
  (seeded Gaussian hyperplanes); search joins only same-bucket
  (+ 1-bit multiprobe) candidates across tables. Recall tunable via
  (bits, tables) without touching the query.
- IVF (inverted file): seeded k-means centroids trained on a bounded
  sample; corpus bucketed by nearest centroid; queries probe their
  nprobe closest lists. Cost ∝ |Q|·(nprobe/n_lists)·|C|.

Hyperplanes/centroids are generated driver-side from a fixed seed
(numpy) and shipped as literal arrays — deterministic across runs and
cluster sizes, no UDF, no state.
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


def knn_bruteforce_int8(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over int8-quantized vectors: the memory-bandwidth path
    for 100 TB vector corpora (4x smaller scan than float32). Cosine
    is scale-invariant, so the per-vector quantization scales cancel
    and the kernel runs directly on the tinyint arrays — no
    dequantize step. Recall vs the float baseline is pinned in
    tests/test_ext.py (quantization error ~1/254 per element)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), V.quantize_int8(F.col(vec_col))["q"].alias("qq")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), V.quantize_int8(F.col(vec_col))["q"].alias("cq")
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", grid(V.cosine(F.col("qq"), F.col("cq")), 6))
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


def _all_signatures_pandas(planes_per_table: list, bits: int):
    """Arrow-vectorized signature computation: ONE numpy matmul per
    batch computes every table's b-bit signature at once. This is the
    sanctioned Pandas-UDF fast path — the pure-builtin alternative is
    tables*bits interpreted HOF dot-folds per row (~50x slower for
    8x6 signatures on 64-dim vectors). Closure is self-contained
    (planes captured by value; numpy imported inside)."""
    import numpy as _np

    planes = _np.array(planes_per_table, dtype=_np.float64)  # (tables*bits, dim)
    n_tables = planes.shape[0] // bits
    weights = (1 << _np.arange(bits)).astype(_np.int64)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<long>")
    def sigs(vecs):
        import pandas as _pd

        m = _np.vstack(vecs.to_numpy())  # (n, dim)
        bits_m = (m @ planes.T) >= 0  # (n, tables*bits)
        out = []
        for t in range(n_tables):
            block = bits_m[:, t * bits:(t + 1) * bits].astype(_np.int64)
            out.append(block @ weights)
        stacked = _np.stack(out, axis=1)  # (n, tables)
        return _pd.Series(list(stacked))

    return sigs


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
    all_planes = []
    for t in range(tables):
        all_planes.extend(_hyperplanes(dim, bits, seed + 7919 * t))
    sig_udf = _all_signatures_pandas(all_planes, bits)
    q = q.withColumn("qsigs", sig_udf(F.col("qv")))
    c = c.withColumn("csigs", sig_udf(F.col("cv")))
    # probe buckets per table: own + each 1-bit flip, tagged by table id
    probes = F.array(*[
        F.struct(
            F.lit(t).alias("t"),
            (F.col("qsigs")[t] if i < 0 else
             F.col("qsigs")[t].bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))).alias("b"),
        )
        for t in range(tables)
        for i in range(-1, bits)
    ])
    q_probed = q.select("query_id", F.explode(probes).alias("p"))
    buckets = c.select(
        "neighbor_id",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("t"), F.col("csigs")[t].alias("b")) for t in range(tables)
        ])).alias("p"),
    )
    # dedup candidates on the (int, int) pair BEFORE re-attaching the
    # vectors: the distinct shuffle moves 16 bytes/row instead of two
    # 64-float arrays
    cand = (
        q_probed.join(buckets, ["p"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(q.select("query_id", "qv"), "query_id")
        .join(c.select("neighbor_id", "cv"), "neighbor_id")
        .withColumn("cosine", grid(V.cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the clustering-based scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 16,
    iters: int = 8,
    sample_size: int = 2048,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train IVF centroids with seeded Lloyd iterations on a bounded
    driver-side sample — the standard IVF recipe (train small, assign
    big). The returned centroids are plain literals: broadcastable,
    deterministic, no state to ship.

    The sample is the ``sample_size`` smallest ``id_col`` rows
    (TakeOrderedAndProject: per-partition top-k then a driver merge, no
    full sort) — a bare ``limit()`` takes whichever partitions answer
    first, so centroids would vary with partition layout / cluster
    size, contradicting the determinism contract."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_size)
        .select(vec_col).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        # cosine assignment on normalized vectors ≡ max dot product
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        assign = (xn @ cn.T).argmax(axis=1)
        for j in range(len(centroids)):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return [[float(v) for v in c] for c in centroids]


def _centroid_sims(vec_col, centroids: list[list[float]]):
    """Per-centroid scores dot(v,c)/|c| — proportional to cosine for a
    fixed v, so argmax/ordering (all IVF needs) is identical while
    skipping |v|. (Unrolled literal-index expressions measured SLOWER
    than the fold here: 16x64 terms blow past codegen limits and fall
    back to a giant interpreted tree.) Kept as the no-UDF fallback;
    the hot path is ``_centroid_sims_pandas`` below (HOF folds are
    CodegenFallback, so this tree is interpreted AND re-evaluated at
    every reference — profiled at ~1.7s for 2k rows x 16 lists)."""
    import math

    return F.array(*[
        V.dot(vec_col, F.array(*[F.lit(p) for p in c])) / math.sqrt(sum(x * x for x in c))
        for c in centroids
    ])


def _centroid_sims_pandas(centroids: list[list[float]]):
    """Arrow-vectorized centroid scores: ONE numpy matmul per batch
    computes dot(v,c)/|c| against every centroid at once — same
    ordering semantics as ``_centroid_sims``. Python UDF results are
    materialized by a dedicated ArrowEvalPython node, so downstream
    argmax/top-nprobe references never re-evaluate the scores (the
    builtin HOF fold was interpreted and re-evaluated per reference).
    Closure is self-contained (centroids captured by value, numpy
    imported inside) — mirrors ``_all_signatures_pandas``."""
    import numpy as _np

    c = _np.array(centroids, dtype=_np.float64)  # (lists, dim)
    c_scaled = (c / _np.linalg.norm(c, axis=1, keepdims=True)).T  # (dim, lists)

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<double>")
    def sims(vecs):
        import pandas as _pd

        m = _np.vstack(vecs.to_numpy())  # (n, dim)
        return _pd.Series(list(m @ c_scaled))

    return sims


def _pair_cosine_pandas():
    """Arrow-vectorized exact cosine for candidate pairs: one
    elementwise-product reduction per batch instead of an interpreted
    64-term HOF fold per row. Used on the IVF scoring path, whose
    oracle is a recall contract (pair sets), not a value hash —
    ``knn_bruteforce`` keeps the JVM fold (``V.cosine``) because its
    cosine column IS hash-compared against the DuckDB fold."""
    import numpy as _np

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def cos(qv, cv):
        import pandas as _pd

        a = _np.vstack(qv.to_numpy())
        b = _np.vstack(cv.to_numpy())
        num = (a * b).sum(axis=1)
        den = _np.linalg.norm(a, axis=1) * _np.linalg.norm(b, axis=1)
        return _pd.Series(num / den)

    return cos


def ivf_assign(df: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine) — one
    narrow projection, no shuffle. The scores land in their own column
    first (an alias of a non-cheap expression survives CollapseProject)
    so argmax reads the materialized array instead of re-evaluating."""
    sims = F.col("__sims")
    return (
        df.withColumn("__sims", _centroid_sims_pandas(centroids)(F.col(vec_col)))
        .withColumn("__list", (F.array_position(sims, F.array_max(sims)) - 1).cast("int"))
        .drop("__sims")
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid;
    each query probes its ``nprobe`` closest lists; exact cosine rank
    within the probed lists. Cost ∝ |Q| · (nprobe/n_lists) · |C| —
    the tunable recall/cost dial of the clustering-based scale path."""
    centroids = centroids or train_ivf_centroids(
        corpus, n_lists=n_lists, vec_col=vec_col, id_col=id_col
    )
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids, "cv",
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    ranked = F.sort_array(
        F.arrays_zip(
            F.col("__sims").alias("s"),
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("i"),
        ),
        asc=False,
    )
    q_probed = (
        q.withColumn("__sims", _centroid_sims_pandas(centroids)(F.col("qv")))
        .withColumn(
            "__list",
            F.explode(F.transform(F.slice(ranked, 1, nprobe), lambda z: z["i"].cast("int"))),
        )
        .drop("__sims")
    )
    cand = (
        q_probed.join(c.drop("cv"), "__list")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(q.select("query_id", "qv"), "query_id")
        .join(c.select("neighbor_id", "cv"), "neighbor_id")
        .withColumn("cosine", grid(_pair_cosine_pandas()(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
