"""Similarity-search queries over the embeddings table (north-star
extension): brute-force cosine top-k with an exact DuckDB oracle, and
the LSH-bucketed approximate variant (rows-only check; recall vs the
exact baseline is asserted in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid
from ..operators import similarity as S
from ..sources.testdata import table

K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 → 10 queries at sf0.01, 40 at sf0.1


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_bruteforce(queries, emb, k=K)


# cosine = exact sequential double fold (see dedup_plans note)
KNN_BRUTEFORCE_SQL = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           floor((list_sum(list_transform(range(1, len(q.embedding)+1), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (sqrt(list_sum(list_transform(range(1, len(q.embedding)+1), i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))))) * 1000000 + 0.5) / 1000000 AS cosine
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id % {QUERY_MOD} = 0
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {K}
"""


_IVF_CENTROID_CACHE: dict[tuple, list] = {}

# pinned recall floors, measured at sf0.01/sf0.1 (seeded/deterministic:
# lsh 0.92/0.935, ivf 0.82/0.765 at nprobe=6/16)
LSH_RECALL_FLOOR = 0.9
IVF_RECALL_FLOOR = 0.7
IVF_NPROBE = 6


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw IVF top-k (the serving-path output; benched as headline)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    # index build amortized per corpus (the IVF deployment model:
    # train once, serve many) — deterministic, so caching is safe
    return S.knn_ivf(
        queries, emb, k=K, n_lists=16, nprobe=IVF_NPROBE,
        centroids=_centroids(emb, sf_dir),
    )


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw multi-table LSH top-k (the serving-path output)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_lsh(queries, emb, k=K, bits=6, tables=8, dim=64)


def _recall_summary(spark, sf_dir, approx_fn, floor: float) -> DataFrame:
    """Driver-checkable quality contract for an approximate ANN
    operator: recall@k vs the exact brute-force baseline, folded to a
    row the DuckDB oracle can independently pin (n_queries and k are
    SQL-computable; the recall floor is asserted as a boolean the
    oracle expects to be true). Both result sets use the same
    deterministic tie-break, so recall is exact set overlap."""
    exact = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    approx = approx_fn(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("approx_neighbor_id")
    )
    hits = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.neighbor_id == approx.approx_neighbor_id),
        "left_semi",
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n")).select("n")
    n_hit = hits.agg(F.count(F.lit(1)).alias("h")).select("h")
    return (
        n_exact.crossJoin(n_hit)
        .select(
            (F.col("n") / K).cast("long").alias("n_queries"),
            F.lit(K).alias("k"),
            (F.col("h") >= F.lit(floor) * F.col("n")).alias("recall_ok"),
        )
    )


def knn_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_summary(spark, sf_dir, knn_lsh, LSH_RECALL_FLOOR)


def knn_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_summary(spark, sf_dir, knn_ivf, IVF_RECALL_FLOOR)


KNN_RECALL_SQL = f"""
SELECT COUNT(*) AS n_queries, {K} AS k, true AS recall_ok
FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
"""


# ---------------------------------------------------------------------------
# similarity_scale_suite (r5 verdict #4): driver-visible quality +
# cost contracts for the r5 ANN additions — PQ, composed IVF-PQ and
# int8 — mirroring the corpus_hygiene_suite pattern: one wide row of
# labeled aggregates whose DuckDB oracle pins the SQL-computable
# values exactly and the quality/cost booleans as expected-true.
# ---------------------------------------------------------------------------

# Pinned floors, measured deterministic (seeded training sample,
# seeded Lloyd) at sf0.01 / sf0.1 with ks=16, refine=32, nprobe=6:
# pq 0.94 / 0.76, ivf_pq 0.82 / 0.69, int8 1.00 / 0.985. The weakly
# similar synthetic vectors (cos≈0.3) are the hard regime for an
# 8-byte code — real clustered embeddings sit far above these.
PQ_RECALL_FLOOR = 0.7
IVFPQ_RECALL_FLOOR = 0.6
INT8_RECALL_FLOOR = 0.9
SUITE_REFINE = 32
# nprobe=6 of 16 lists probes ~3/8 of the corpus in expectation;
# 0.6 allows for list-size imbalance while still proving the scan is
# a strict fraction of |Q|x|C|.
IVFPQ_CAND_FRAC_CEIL = 0.6
# SemDeDup contract (r7): exact clones of every %SEMDEDUP_CLONE_MOD
# vector are injected (identical vectors always co-assign, and the
# raw corpus max pairwise cosine is 0.513 ≪ 0.95), so the true
# semantic pair set is EXACTLY the planted (i, i+offset) pairs —
# fully SQL-derivable counts, not just booleans.
SEMDEDUP_CLONE_MOD = 10
SEMDEDUP_OFFSET = 1_000_000
SEMDEDUP_TH = 0.95

_PQ_CODEBOOK_CACHE: dict[tuple, list] = {}


def _corpus_key(sf_dir: str) -> tuple:
    """Cache key (sf_dir, mtime_ns of embeddings.parquet): the driver
    rewrites testdata between rounds IN-PROCESS (the same reason
    sources/testdata.py re-probes by mtime), so a path-only key could
    serve centroids/codebooks trained on a previous corpus."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = 0
    return (sf_dir, mtime)


def _centroids(emb: DataFrame, sf_dir: str) -> list:
    key = _corpus_key(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = S.train_ivf_centroids(emb, n_lists=16)
    return _IVF_CENTROID_CACHE[key]


def _codebooks(emb: DataFrame, sf_dir: str) -> list:
    key = _corpus_key(sf_dir)
    if key not in _PQ_CODEBOOK_CACHE:
        _PQ_CODEBOOK_CACHE[key] = S.train_pq_codebooks(emb)
    return _PQ_CODEBOOK_CACHE[key]


def _semdedup_corpus(emb: DataFrame) -> DataFrame:
    """THE single definition of the SemDeDup bench/contract corpus —
    embeddings plus an exact clone of every %SEMDEDUP_CLONE_MOD
    vector — shared by the suite row and the serving bench entry so
    the benched workload is exactly the certified one."""
    clones = emb.where(F.col("vec_id") % SEMDEDUP_CLONE_MOD == 0).select(
        (F.col("vec_id") + SEMDEDUP_OFFSET).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(clones)


def semantic_dedup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SemDeDup pairing (the serving path; benched — quality and
    exact-count contracts are driver-checked via
    similarity_scale_suite). Centroids come from the per-corpus cache,
    matching the train-once-serve-many deployment model the other ANN
    bench entries use."""
    emb = table(spark, sf_dir, "embeddings")
    from ..operators import dedup as D

    return D.semantic_near_dup_pairs(
        _semdedup_corpus(emb), _centroids(emb, sf_dir), threshold=SEMDEDUP_TH
    )


def knn_pq_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw PQ top-k (the serving-path output; benched as headline —
    not a registry row; quality is driver-checked via
    similarity_scale_suite). Codebooks cached per corpus."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_pq(
        queries, emb, codebooks=_codebooks(emb, sf_dir), k=K, refine=SUITE_REFINE
    )


def similarity_scale_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: recall@k of PQ / IVF-PQ / int8 vs the exact baseline
    (booleans against the pinned floors above) plus the IVF-PQ
    probed-candidate volume as a fraction of all pairs — the cost
    contract that makes the composed path a scale win, not just a
    correct one.

    Widened (r10) with ``rrf_*``: hybrid retrieval by Reciprocal
    Rank Fusion (operators/ranking.py::hybrid_rrf) — BM25 over
    documents fused with embedding-cosine against the vec_id=0 query
    vector; the fused nano-fixed-point LONG scores, top-1 id, top-n
    fingerprint and both-lists overlap are replayed exactly in the
    oracle (same grid-6 score snap, same (score desc, id) rank
    order, same floor(1e9/(k+rank)) integer contributions)."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    cents = _centroids(emb, sf_dir)
    books = _codebooks(emb, sf_dir)
    # r13: slot cache (was bare .cache() — one leaked exact pair
    # table per suite execution; functions/cacheslot.py)
    from ..functions.cacheslot import slot_cache

    exact = slot_cache(
        "similarity.scale_suite.exact",
        S.knn_bruteforce(queries, emb, k=K).select("query_id", "neighbor_id"),
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n")).select("n")

    def _ok(approx: DataFrame, floor: float, name: str) -> DataFrame:
        a = approx.select(
            F.col("query_id").alias("qid"), F.col("neighbor_id").alias("nid")
        )
        hits = exact.join(
            a,
            (exact.query_id == a.qid) & (exact.neighbor_id == a.nid),
            "left_semi",
        ).agg(F.count(F.lit(1)).alias("h"))
        return n_exact.crossJoin(hits).select(
            (F.col("h") >= F.lit(floor) * F.col("n")).alias(name)
        )

    pq_ok = _ok(
        S.knn_pq(queries, emb, codebooks=books, k=K, refine=SUITE_REFINE),
        PQ_RECALL_FLOOR, "pq_recall_ok",
    )
    ivfpq_ok = _ok(
        S.knn_ivf_pq(
            queries, emb, k=K, n_lists=16, nprobe=IVF_NPROBE,
            refine=SUITE_REFINE, codebooks=books, centroids=cents,
        ),
        IVFPQ_RECALL_FLOOR, "ivfpq_recall_ok",
    )
    int8_ok = _ok(
        S.knn_bruteforce_int8(queries, emb, k=K), INT8_RECALL_FLOOR, "int8_recall_ok"
    )

    # probed-candidate volume: Σ over queries of the sizes of their
    # nprobe probed lists (the ADC scan row count before dedup) — must
    # stay a strict fraction of |Q|·|C|.
    c_assigned = S.ivf_assign(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")),
        cents, "cv",
    )
    list_sizes = c_assigned.groupBy("__list").agg(F.count(F.lit(1)).alias("c_n"))
    # probe selection via the OPERATOR's own helper (S.ivf_probe_lists)
    # so the certified volume is the volume knn_ivf_pq actually scans
    q_probed = S.ivf_probe_lists(
        queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")),
        cents, IVF_NPROBE, "qv",
    ).select("query_id", "__list")
    vol = q_probed.join(list_sizes, "__list").agg(
        F.coalesce(F.sum("c_n"), F.lit(0)).alias("vol")
    )
    nq = queries.agg(F.count(F.lit(1)).alias("nq"))
    nc = emb.agg(F.count(F.lit(1)).alias("nc"))
    frac_ok = (
        vol.crossJoin(nq).crossJoin(nc).select(
            (
                F.col("vol")
                <= F.lit(IVFPQ_CAND_FRAC_CEIL) * F.col("nq") * F.col("nc")
            ).alias("ivfpq_cand_frac_ok")
        )
    )

    base = n_exact.select(
        (F.col("n") / K).cast("long").alias("n_queries"), F.lit(K).alias("k")
    )

    # SemDeDup (r7): planted exact clones → the found pair set must be
    # exactly the planted set, each at grid-6 cosine 1.0, and dedup
    # must keep precisely the original corpus (min-id canonical).
    from ..operators import dedup as D

    aug = _semdedup_corpus(emb)
    # r13: slot cache (was bare .cache() — per-execution leak)
    from ..functions.cacheslot import slot_cache

    sem_pairs = slot_cache(
        "similarity.scale_suite.sem_pairs",
        D.semantic_near_dup_pairs(aug, cents, threshold=SEMDEDUP_TH),
    )
    sem_agg = sem_pairs.agg(
        F.count(F.lit(1)).alias("semdedup_pairs"),
        grid(
            F.coalesce(F.sum(grid(F.col("cosine"), 2)), F.lit(0.0)), 2
        ).alias("semdedup_cosine_total"),
        F.coalesce(
            F.min(
                (
                    (F.col("id_b") - F.col("id_a") == SEMDEDUP_OFFSET)
                    & (F.pmod(F.col("id_a"), F.lit(SEMDEDUP_CLONE_MOD)) == 0)
                ).cast("int")
            ).cast("boolean"),
            F.lit(True),
        ).alias("semdedup_pairs_planted_ok"),
    )
    sem_kept = (
        D.semantic_dedup(aug, cents, threshold=SEMDEDUP_TH, pairs=sem_pairs)
        .where("is_canonical")
        .agg(F.count(F.lit(1)).alias("semdedup_kept"))
    )

    # r10: hybrid RRF retrieval (BM25 ⊕ cosine-vs-query-0), exact
    # integer fusion — see the docstring widening note
    from ..functions.vectors import cosine as _cos
    from ..operators.ranking import bm25_scores, hybrid_rrf

    docs = table(spark, sf_dir, "documents")
    lex = bm25_scores(docs, RRF_TERMS).select("doc_id", "bm25")
    qv = emb.where(F.col("vec_id") == RRF_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    sem = (
        emb.where(F.col("vec_id") != RRF_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").cast("long").alias("doc_id"),
            grid(_cos(F.col("embedding"), F.col("qv")), 6).alias("cosine"),
        )
    )
    fused = hybrid_rrf(
        lex, sem, rrf_k=RRF_K, top_n=RRF_TOP, candidates=RRF_CANDIDATES
    )
    rrf_agg = fused.agg(
        F.count(F.lit(1)).cast("long").alias("rrf_topn"),
        F.coalesce(
            F.min_by(
                F.col("doc_id"),
                F.struct((-F.col("rrf_nano")).alias("s"), F.col("doc_id").alias("i")),
            ),
            F.lit(-1),
        ).cast("long").alias("rrf_top1_id"),
        F.coalesce(
            F.sum((F.col("doc_id") + 1) * F.col("rrf_nano")), F.lit(0)
        ).cast("long").alias("rrf_fp"),
        F.coalesce(
            F.sum(
                ((F.col("lex_rank") > 0) & (F.col("sem_rank") > 0)).cast("long")
            ),
            F.lit(0),
        ).cast("long").alias("rrf_both"),
    )

    return (
        base.crossJoin(pq_ok).crossJoin(ivfpq_ok).crossJoin(int8_ok).crossJoin(frac_ok)
        .crossJoin(sem_agg).crossJoin(sem_kept).crossJoin(F.broadcast(rrf_agg))
    )


RRF_TERMS = ["data", "merge", "vector"]
RRF_QUERY_ID = 0
RRF_K = 60
RRF_TOP = 10
RRF_CANDIDATES = 50

_RRF_TERMS_SQL = ", ".join(f"'{t}'" for t in RRF_TERMS)

# BM25 replay = the hygiene oracle's construct (same tokenization,
# same formula, grid-6); cosine replay = the knn oracle's sequential
# double fold vs the vec_id=0 row; fusion = ROW_NUMBER ranks under
# (score DESC, id) + floor(1e9/(k+rank)) LONG contributions.
_RRF_SQL_CTES = f"""
rrf_toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM documents
), rrf_dt AS (
    SELECT doc_id, len(t) AS doc_len, unnest(t) AS term FROM rrf_toks
), rrf_tf AS (
    SELECT doc_id, doc_len, term, COUNT(*) AS tf FROM rrf_dt GROUP BY ALL
), rrf_corpus AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs,
           SUM(tf) / COUNT(DISTINCT doc_id) AS avg_len
    FROM rrf_tf
), rrf_dfs AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM rrf_tf
    WHERE term IN ({_RRF_TERMS_SQL}) GROUP BY term
), rrf_lex AS (
    SELECT tf.doc_id,
           floor(SUM(ln(1.0 + (c.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.doc_len / c.avg_len))) * 1000000 + 0.5) / 1000000 AS bm25
    FROM rrf_tf tf JOIN rrf_dfs dfs USING (term) CROSS JOIN rrf_corpus c
    WHERE tf.term IN ({_RRF_TERMS_SQL})
    GROUP BY tf.doc_id
), rrf_lex_rank AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
    FROM rrf_lex ORDER BY bm25 DESC, doc_id LIMIT {RRF_CANDIDATES}
), rrf_sem AS (
    SELECT c.vec_id AS doc_id,
           floor((list_sum(list_transform(range(1, len(q.embedding)+1), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) / (sqrt(list_sum(list_transform(range(1, len(q.embedding)+1), i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) * sqrt(list_sum(list_transform(range(1, len(c.embedding)+1), i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))))) * 1000000 + 0.5) / 1000000 AS cosine
    FROM embeddings c CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {RRF_QUERY_ID}) q
    WHERE c.vec_id <> {RRF_QUERY_ID}
), rrf_sem_rank AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
    FROM rrf_sem ORDER BY cosine DESC, doc_id LIMIT {RRF_CANDIDATES}
), rrf_fused AS (
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE(CAST(floor(1000000000 / ({RRF_K} + l.lex_rank)) AS BIGINT), 0)
              + COALESCE(CAST(floor(1000000000 / ({RRF_K} + s.sem_rank)) AS BIGINT), 0)
              AS BIGINT) AS rrf_nano,
           CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(s.sem_rank, 0) AS BIGINT) AS sem_rank
    FROM rrf_lex_rank l FULL OUTER JOIN rrf_sem_rank s ON l.doc_id = s.doc_id
), rrf_top AS (
    SELECT * FROM rrf_fused ORDER BY rrf_nano DESC, doc_id LIMIT {RRF_TOP}
), rrf_agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS rrf_topn,
           CAST(COALESCE(FIRST(doc_id ORDER BY rrf_nano DESC, doc_id), -1) AS BIGINT)
               AS rrf_top1_id,
           CAST(COALESCE(SUM((doc_id + 1) * rrf_nano), 0) AS BIGINT) AS rrf_fp,
           CAST(COALESCE(SUM(CASE WHEN lex_rank > 0 AND sem_rank > 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS rrf_both
    FROM rrf_top
)
"""

SIMILARITY_SCALE_SUITE_SQL = f"""
WITH {_RRF_SQL_CTES}
SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id % {QUERY_MOD} = 0) AS n_queries,
       {K} AS k,
       true AS pq_recall_ok, true AS ivfpq_recall_ok,
       true AS int8_recall_ok, true AS ivfpq_cand_frac_ok,
       (SELECT COUNT(*) FROM embeddings WHERE vec_id % {SEMDEDUP_CLONE_MOD} = 0)
           AS semdedup_pairs,
       CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id % {SEMDEDUP_CLONE_MOD} = 0)
            AS DOUBLE) AS semdedup_cosine_total,
       true AS semdedup_pairs_planted_ok,
       (SELECT COUNT(*) FROM embeddings) AS semdedup_kept,
       rrf_topn, rrf_top1_id, rrf_fp, rrf_both
FROM rrf_agg
"""


KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 km_* scalar block alone (distributed Lloyd's fit over
    the full embeddings table) — benched as its own entry; the driver
    contract rides sim_vector_stats."""
    from ..operators.clustering import kmeans_report

    return kmeans_report(
        table(spark, sf_dir, "embeddings"), k=KMEANS_K, iters=KMEANS_ITERS
    )


EMB_MILLI = 1000


def _embedding_moments(emb: DataFrame) -> DataFrame:
    """One row of exact emb_* embedding-health moments on a milli-
    snapped integer grid — the anisotropy diagnostic (Ethayarajh 2019,
    "How Contextual are Contextualized Word Representations?"; Mu &
    Viswanath 2018, "All-but-the-Top" — public): a large average
    pairwise dot product means the embedding cloud collapses toward a
    common direction, which silently degrades every cosine-based
    consumer (SemDeDup, ANN, near-dup LSH).

    The O(n²) pairwise sum is NEVER formed: Σ_{i≠j} <v_i, v_j> =
    ||Σ_i v_i||² − Σ_i ||v_i||², so everything derives from per-
    dimension sums — one explode + a dim-sized aggregation. Exactness:
    values snap to LONG millis (floor(x·1e3 + 0.5)); sums, squares
    and differences stay LONG, so no float summation order exists.
    Ratios are deliberately NOT taken (Spark DIV truncates, DuckDB //
    floors — they disagree on negatives); the row carries exact
    integer numerators and emb_n, and readers divide.

    Scale envelope: per-dim sums are LONG-safe to ~9e15 milli units
    (≈ 9e12 unit-norm vectors per dimension); the squared-sum
    fingerprints are LONG-safe to n ≈ 3e6 at |x|≤1 — beyond that,
    shard the corpus and combine per-shard rows (the sums are
    mergeable; document-level exactness is preserved per shard).
    """
    pts = emb.select(F.posexplode("embedding").alias("pos", "x")).select(
        "pos",
        F.floor(F.col("x").cast("double") * EMB_MILLI + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    dims = pts.groupBy("pos").agg(
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("q"),
    )
    counts = emb.agg(
        F.count(F.lit(1)).cast("long").alias("emb_n"),
        F.coalesce(F.max(F.size("embedding")), F.lit(0)).cast("long").alias(
            "emb_dim"
        ),
    )
    agg = dims.agg(
        F.coalesce(F.sum((F.col("pos") + 1) * F.col("s")), F.lit(0))
        .cast("long").alias("emb_sum_fp"),
        F.coalesce(F.sum(F.col("s") * F.col("s")), F.lit(0))
        .cast("long").alias("emb_norm2_num"),
        F.coalesce(F.sum("q"), F.lit(0)).cast("long").alias("emb_sq_total"),
    )
    return counts.crossJoin(F.broadcast(agg)).select(
        "emb_n", "emb_dim", "emb_sum_fp", "emb_sq_total", "emb_norm2_num",
        (F.col("emb_norm2_num") - F.col("emb_sq_total")).alias(
            "emb_pairdot_num"
        ),
    )


def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-math surface over the embedding column: dimensionality,
    L2 norm and element mean via JVM-side folds (functions/vectors).
    Widened (r10) with the ``km_*`` distributed-k-means scalars
    (operators/clustering.py: full-corpus Lloyd iterations on the
    integer MICRO grid — assignments, inertia and centroids all
    exact LONGs the oracle replays as unrolled SQL iterations) and
    the ``emb_*`` embedding-health moments (:func:`_embedding_moments`
    — exact milli-grid anisotropy numerators, no O(n²) pair scan)."""
    from ..functions import vectors as V
    from ..functions.numeric import grid

    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            grid(V.norm(F.col("embedding")), 6).alias("l2_norm"),
            grid(
                V.dot(F.col("embedding"), F.transform(F.col("embedding"), lambda x: F.lit(1.0)))
                / F.size("embedding"),
                6,
            ).alias("mean_val"),
        )
        .crossJoin(F.broadcast(kmeans_serving(spark, sf_dir)))
        .crossJoin(F.broadcast(_embedding_moments(emb)))
    )


def _kmeans_sql_ctes(k: int, iters: int) -> str:
    """Unrolled-iteration DuckDB replay of operators/clustering.py
    (the pagerank pr_* pattern): integer MICRO snap, LONG squared
    distances, encoded argmin MIN(d*1024 + j), floor(double/count)
    centroid updates — the exact expression shapes the Spark side
    runs, so every scalar is bit-equal."""
    enc, mask, bits = 1 << 10, (1 << 10) - 1, 10
    ctes = [
        """km_pts AS (
    SELECT vec_id, i - 1 AS pos,
           CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT) AS v
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
)""",
        f"""km_c0 AS (
    SELECT CAST(vec_id AS BIGINT) AS j, pos, v FROM km_pts
    WHERE vec_id < {k}
)""",
    ]
    for t in range(1, iters + 1):
        prev = f"km_c{t - 1}"
        ctes.append(f"""km_d{t} AS (
    SELECT p.vec_id, c.j,
           CAST(SUM((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS d
    FROM km_pts p JOIN {prev} c ON p.pos = c.pos
    GROUP BY p.vec_id, c.j
)""")
        ctes.append(f"""km_a{t} AS (
    SELECT vec_id, MIN(d * {enc} + j) & {mask} AS cluster
    FROM km_d{t} GROUP BY vec_id
)""")
        ctes.append(f"""km_c{t} AS (
    SELECT a.cluster AS j, p.pos,
           CAST(floor(CAST(SUM(p.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
    FROM km_pts p JOIN km_a{t} a USING (vec_id)
    GROUP BY a.cluster, p.pos
)""")
    final = f"km_c{iters}"
    ctes.append(f"""km_df AS (
    SELECT p.vec_id, c.j,
           CAST(SUM((p.v - c.v) * (p.v - c.v)) AS BIGINT) AS d
    FROM km_pts p JOIN {final} c ON p.pos = c.pos
    GROUP BY p.vec_id, c.j
)""")
    ctes.append("""km_af AS (
    SELECT vec_id, MIN(d * %d + j) AS enc FROM km_df GROUP BY vec_id
)""" % enc)
    ctes.append(f"""km_dim AS (
    SELECT CAST(MAX(pos) + 1 AS BIGINT) AS dim FROM km_pts
)""")
    ctes.append(f"""km_cfp AS (
    SELECT CAST(SUM((c.j * km_dim.dim + c.pos + 1) * c.v) AS BIGINT)
               AS km_centroid_fp
    FROM {final} c, km_dim
)""")
    ctes.append(f"""kmagg AS (
    SELECT CAST({k} AS BIGINT) AS km_k,
           CAST({iters} AS BIGINT) AS km_iters,
           CAST(COUNT(*) AS BIGINT) AS km_points,
           CAST(COUNT(DISTINCT enc & {mask}) AS BIGINT) AS km_clusters,
           CAST(SUM(enc >> {bits}) AS BIGINT) AS km_inertia,
           CAST(SUM((enc & {mask}) + 1) AS BIGINT) AS km_sizes_fp,
           CAST(SUM((vec_id % 97) * ((enc & {mask}) + 1)) AS BIGINT)
               AS km_assign_fp,
           (SELECT km_centroid_fp FROM km_cfp) AS km_centroid_fp
    FROM km_af
)""")
    return ",\n".join(ctes)


VECTOR_STATS_SQL = f"""
WITH {_kmeans_sql_ctes(KMEANS_K, KMEANS_ITERS)},
em_pts AS (
    SELECT i - 1 AS pos,
           CAST(floor(embedding[i]::DOUBLE * {EMB_MILLI} + 0.5) AS BIGINT) AS v
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)
), em_dims AS (
    SELECT pos, CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS q
    FROM em_pts GROUP BY pos
), em_n AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS emb_n,
           CAST(COALESCE(MAX(len(embedding)), 0) AS BIGINT) AS emb_dim
    FROM embeddings
), em_agg AS (
    SELECT CAST(COALESCE(SUM((pos + 1) * s), 0) AS BIGINT) AS emb_sum_fp,
           CAST(COALESCE(SUM(s * s), 0) AS BIGINT) AS emb_norm2_num,
           CAST(COALESCE(SUM(q), 0) AS BIGINT) AS emb_sq_total
    FROM em_dims
), emagg AS (
    SELECT emb_n, emb_dim, emb_sum_fp, emb_sq_total, emb_norm2_num,
           emb_norm2_num - emb_sq_total AS emb_pairdot_num
    FROM em_n, em_agg
)
SELECT vec_id,
       len(embedding) AS dim,
       floor((sqrt(list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) * 1000000 + 0.5) / 1000000 AS l2_norm,
       floor((list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * 1.0)) / len(embedding)) * 1000000 + 0.5) / 1000000 AS mean_val,
       km_k, km_iters, km_points, km_clusters, km_inertia,
       km_sizes_fp, km_assign_fp, km_centroid_fp,
       emb_n, emb_dim, emb_sum_fp, emb_sq_total, emb_norm2_num,
       emb_pairdot_num
FROM embeddings, kmagg, emagg
"""


QUERIES = {
    "sim_knn_bruteforce": knn_bruteforce,
    # r12: sim_knn_lsh demoted to a pytest oracle
    # (tests/test_correctness.py::test_demoted_knn_lsh_recall_oracle) —
    # its oracle was the thinnest in the registry (n_queries + an
    # expected-true recall boolean) and the LSH surface stays
    # driver-visible via similarity_scale_suite; the slot funds the
    # corpus_pipeline integration row (plans/pipeline_plans.py).
    "sim_knn_ivf": knn_ivf_recall,
    "sim_vector_stats": vector_stats,
    # r6: driver-visible recall + candidate-volume contracts for the
    # r5 ANN additions (PQ / IVF-PQ / int8); its registry slot came
    # from op_set_ops, demoted to a pytest oracle.
    "similarity_scale_suite": similarity_scale_suite,
}

# The approximate entries are recorded via their recall contract
# (driver-hashable); the raw top-k outputs stay benched (bench.py) and
# recall-tested (tests/test_ext.py).
ORACLES = {
    "sim_knn_bruteforce": KNN_BRUTEFORCE_SQL,
    "sim_knn_ivf": KNN_RECALL_SQL,
    "sim_vector_stats": VECTOR_STATS_SQL,
    "similarity_scale_suite": SIMILARITY_SCALE_SUITE_SQL,
}
