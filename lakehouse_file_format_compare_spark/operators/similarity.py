"""Approximate-nearest-neighbor search over embedding columns.

Strategies sharing the cosine kernel (functions/vectors.py):

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
- int8 quantized brute force: 4x smaller scan, scale-invariant cosine.
- product quantization (PQ): m-byte codes (32x smaller scan), ADC
  lookup-table scoring in pure JVM, exact-cosine re-rank.

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


def ivf_probe_lists(
    df: DataFrame, centroids: list[list[float]], nprobe: int, vec_col: str
) -> DataFrame:
    """``__list``-exploded copy of ``df``: each row repeated once per
    probed list (its ``nprobe`` highest-scoring centroids; score ties
    resolve to the HIGHER centroid index — ``sort_array(asc=False)``
    on (score, index) structs orders the index descending too).
    THE single definition of IVF probe selection — shared by
    :func:`knn_ivf`, :func:`knn_ivf_pq` and the driver-visible
    candidate-volume contract (plans/similarity_plans.py), so the
    certified scan volume is always the scan actually served."""
    ranked = F.sort_array(
        F.arrays_zip(
            F.col("__sims").alias("s"),
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("i"),
        ),
        asc=False,
    )
    return (
        df.withColumn("__sims", _centroid_sims_pandas(centroids)(F.col(vec_col)))
        .withColumn(
            "__list",
            F.explode(F.transform(F.slice(ranked, 1, nprobe), lambda z: z["i"].cast("int"))),
        )
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
    q_probed = ivf_probe_lists(q, centroids, nprobe, "qv")
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


# ---------------------------------------------------------------------------
# Product quantization (IVF's companion: the memory-bound scan path)
# ---------------------------------------------------------------------------
# PQ compresses each corpus vector to m one-byte codes (here m ints):
# the 64-dim float corpus becomes m=8 codes — a 32x smaller scan. The
# asymmetric-distance (ADC) trick keeps the query in full precision:
# per query, precompute an m x ks lookup table of subspace dot
# products against the codebooks ONCE (Arrow, |Q| rows only), then the
# |Q| x |C| hot scan is a pure JVM aggregate over the code arrays —
# whole-stage codegen, no Python in the inner loop. Candidates are
# re-ranked with EXACT cosine on the original vectors (refine factor),
# so emitted scores are exact and only recall is approximate — the
# family's verified-candidate contract.


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 8,
    sample_size: int = 2048,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks (m subspaces × ks centroids) with
    seeded Lloyd iterations on the same bounded deterministic sample
    recipe as :func:`train_ivf_centroids`. Vectors are L2-normalized
    before splitting, so subspace dot products against codes sum to an
    approximate COSINE — the family's metric. Returns plain literals:
    broadcastable, deterministic, no state to ship."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_size)
        .select(vec_col).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cents = xs[rng.choice(len(xs), size=min(ks, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): per subspace, the index of the nearest codebook
    centroid (Euclidean, on the normalized vector) — one Arrow batch
    matmul per subspace, codes as array<int>."""
    from pyspark.sql.pandas.functions import pandas_udf

    books = [np.array(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<int>")
    def encode(vecs):
        import numpy as _np
        import pandas as _pd

        mat = _np.array(vecs.tolist(), dtype=_np.float64)
        mat = mat / _np.maximum(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sub = mat.shape[1] // len(books)
        codes = []
        for j, cb in enumerate(books):
            xs = mat[:, j * sub:(j + 1) * sub]
            # argmin ||x-c||^2 = argmax (2 x.c - ||c||^2)
            scores = 2 * (xs @ cb.T) - (cb ** 2).sum(axis=1)[None, :]
            codes.append(scores.argmax(axis=1))
        out = _np.stack(codes, axis=1).astype("int32")
        return _pd.Series(list(out))

    return df.select(F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("codes"))


def knn_pq(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    k: int = 5,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k via PQ asymmetric distance + exact re-rank.

    The corpus is PQ-encoded (32× smaller scan at m=8 on 64 dims);
    each query precomputes its m×ks lookup table once (Arrow over |Q|
    rows); the |Q|×|C| ADC scan is a single JVM ``aggregate`` over the
    code arrays; the top ``refine``·k ADC candidates per query are
    re-scored with exact cosine on the original vectors. Output
    matches the family schema (query_id, neighbor_id, cosine, rank)
    with exact scores; recall vs brute force is pinned in
    tests/test_ext.py."""
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec_col=vec_col, id_col=id_col)
    m, ks = len(codebooks), len(codebooks[0])
    books = [np.array(b, dtype=np.float64) for b in codebooks]

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<double>")
    def lut(vecs):
        import numpy as _np
        import pandas as _pd

        mat = _np.array(vecs.tolist(), dtype=_np.float64)
        mat = mat / _np.maximum(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sub = mat.shape[1] // len(books)
        parts = [mat[:, j * sub:(j + 1) * sub] @ books[j].T for j in range(len(books))]
        out = _np.concatenate(parts, axis=1)  # (n, m*ks)
        return _pd.Series(list(out))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lut(F.col(vec_col)).alias("__lut"),
    )
    codes = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)
    # hot path: pure JVM — Σ_j lut[j*ks + codes[j]] over broadcast-side
    # lookup arrays; no Python anywhere in the |Q|x|C| scan
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at("__lut", j * ks + F.element_at("codes", j + 1) + 1),
    )
    scored = (
        q.crossJoin(codes)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), F.col("neighbor_id"))
    cand = scored.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= refine * k
    ).select("query_id", "__qv", "neighbor_id")
    # exact re-rank on the original vectors
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    rescored = cand.join(cv, "neighbor_id").withColumn(
        "cosine", grid(V.cosine(F.col("__qv"), F.col("__cv")), 6)
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def knn_ivf_pq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    refine: int = 4,
    codebooks: list[list[list[float]]] | None = None,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF·PQ composed — the canonical billion-scale ANN recipe
    (FAISS IVFPQ shape): queries probe their ``nprobe`` closest IVF
    lists, the candidates inside those lists are scored by the
    pure-JVM PQ asymmetric distance (32× smaller scan at m=8), and
    the top ``refine``·k per query re-rank with exact cosine. Cost ∝
    |Q| · (nprobe/n_lists) · |C| ADC lookups — both dials (probe
    count, code size) turn independently. Emitted scores exact;
    recall pinned vs brute force in tests/test_ext.py."""
    centroids = centroids or train_ivf_centroids(
        corpus, n_lists=n_lists, vec_col=vec_col, id_col=id_col
    )
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec_col=vec_col, id_col=id_col)
    m, ks = len(codebooks), len(codebooks[0])
    books = [np.array(b, dtype=np.float64) for b in codebooks]

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("array<double>")
    def lut(vecs):
        import numpy as _np
        import pandas as _pd

        mat = _np.array(vecs.tolist(), dtype=_np.float64)
        mat = mat / _np.maximum(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sub = mat.shape[1] // len(books)
        parts = [mat[:, j * sub:(j + 1) * sub] @ books[j].T for j in range(len(books))]
        return _pd.Series(list(_np.concatenate(parts, axis=1)))

    # corpus side: IVF list + PQ codes + the original vector for re-rank
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids, "cv",
    )
    codes = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)
    c = c.join(codes, "neighbor_id")

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_probed = ivf_probe_lists(
        q.withColumn("__lut", lut(F.col("qv"))), centroids, nprobe, "qv"
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at("__lut", j * ks + F.element_at("codes", j + 1) + 1),
    )
    scored = (
        q_probed.join(c.drop("cv"), "__list")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), F.col("neighbor_id"))
    cand = (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= refine * k)
        .select("query_id", "qv", "neighbor_id")
        .distinct()
    )
    rescored = cand.join(
        c.select("neighbor_id", "cv").distinct(), "neighbor_id"
    ).withColumn("cosine", grid(_pair_cosine_pandas()(F.col("qv"), F.col("cv")), 6))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
