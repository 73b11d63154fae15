"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
the MOSS algorithm): select a position-robust subset of character
k-gram hashes such that ANY substring match of length at least
``w + k - 1`` between two documents is guaranteed to share at least
one selected fingerprint.

Algorithm (exactly the paper's): normalize the text (lowercase, keep
``[a-z0-9]`` only), hash every character k-gram, slide a window of
``w`` consecutive hashes, and in each window select the minimum hash
— breaking ties by the RIGHTMOST occurrence. Adjacent windows mostly
select the same gram, so the expected density of selected positions
is ``2 / (w + 1)``: a tunable, guarantee-bearing sample of the
document, unlike whole-doc hashes (miss partial overlap) or MinHash
(probabilistic, no substring guarantee).

Cross-engine exactness: the gram hash is the first 10 hex chars of
``md5`` cast to a 40-bit LONG (Spark ``conv(hex,16,10)`` ==
DuckDB ``CAST('0x'||hex AS BIGINT)``, the operators/sketches.py
discipline), and the rightmost-min selection is ONE integer window
``min`` over an encoded value::

    enc = (hash + 1) * B - pos          (B = 2**22 > any position)

Lower hash wins; among equal hashes the larger position gives the
smaller ``enc`` — exactly the paper's tie rule — and the winner
decodes arithmetically (``fp = enc DIV B``, ``pos = B - enc % B``).
No doubles anywhere, so selections are bit-equal across engines and
invariant to partition layout.

Scale shape (100 TB):
- per-document work only: the gram explode, the hash, and the
  selection window are all partitioned by ``doc_id`` — no global
  window, no cross-document shuffle until the (much smaller)
  selected-fingerprint frame;
- the selection window is ``ROWS BETWEEN CURRENT ROW AND w-1
  FOLLOWING`` within a document — Spark evaluates it streaming per
  partition key with an O(w) buffer;
- the candidate-pair join (``winnow_shared_pairs``) joins the
  SELECTED fingerprints only (~``2/(w+1)`` of gram volume) on the
  fingerprint value — the same bucket-join shape as the MinHash LSH
  band join in operators/dedup.py, with the same hot-bucket hazard
  (a boilerplate gram shared by thousands of docs); ``max_bucket``
  caps the per-fingerprint fan-out exactly like the LSH hot-bucket
  cap, trading recall on degenerate buckets for a bounded join.
- the position encoding assumes normalized documents shorter than
  ``B = 2**22`` characters (4 MiB of alphanumerics); longer inputs
  must be chunked upstream at ingest (the established
  functions/text.py chunking surface). Enforced at runtime: a doc at
  or past the limit raises (``raise_error`` fused into the normalize
  projection, one length compare per doc) instead of silently
  wrapping positions into the hash bits (r10 advice).

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no fingerprinting surface (dags/ are format-comparison ETL);
extension surface per the training-data-pipeline brief (SURVEY §2
extensions — document-fingerprinting family, next to the whole-doc
``fingerprint`` / rolling-hash functions in functions/text.py and the
shingle families in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: position-encoding base; normalized docs must be shorter than this.
POS_B = 1 << 22

#: hex chars of md5 kept for the gram hash (40 bits — (hash+1)*B
#: stays well inside a signed LONG).
HASH_HEX = 10


def _normalize(text):
    """MOSS normalization: lowercase, alphanumerics only. Matches the
    oracle's ``regexp_replace(lower(text), '[^a-z0-9]', '', 'g')``."""
    return F.regexp_replace(F.lower(text), "[^a-z0-9]", "")


def gram_hash(gram):
    """Engine-portable 40-bit gram hash (operators/sketches.py
    ``_cms_bucket`` discipline: md5 hex prefix → integer)."""
    return F.conv(F.substring(F.md5(gram), 1, HASH_HEX), 16, 10).cast("long")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Selected winnowing fingerprints: one row per selected
    ``(doc_id, pos, fp)`` — ``pos`` the 1-based gram position in the
    normalized text, ``fp`` the 40-bit gram hash.

    Guarantee (the paper's correctness theorem): two documents whose
    normalized texts share a substring of length >= ``w + k - 1``
    share at least one ``fp`` value. Documents with fewer than ``w``
    grams contribute the single minimum of all their grams; documents
    shorter than ``k`` after normalization contribute nothing.
    """
    if not (k >= 1 and w >= 1):
        raise ValueError("k and w must be >= 1")
    # r13 (guide §2.3/§2.4): move the ONE shuffle this operator needs
    # BEFORE the gram explode. The selection window must co-locate a
    # document's grams; co-locating the compact TEXT rows first (one
    # hash repartition on doc_id) shuffles strictly fewer bytes than
    # exchanging the exploded (doc, pos, enc) gram rows — ~len rows
    # of 24 B per document vs one text row — and the per-gram
    # md5 hashing then runs AFTER the exchange, spread across the
    # cluster instead of pinned to the scan's input splits (a 0.6 MB
    # parquet is ONE split locally: the whole explode+hash ran in a
    # single task). The window's ClusteredDistribution(doc_id) and
    # the final distinct's ClusteredDistribution(doc_id, pos, fp) are
    # both satisfied by HashPartitioning(doc_id), so no further
    # exchange is introduced: the operator stays ONE shuffle, now of
    # the smallest frame it touches. The explicit partition count
    # (defaultParallelism — cluster-adaptive, not a tuned constant)
    # keeps AQE from coalescing the tiny local frame back to one
    # partition, which would re-serialize the hashing.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(n_part, F.col(id_col))
    # Loud runtime guard (r10 advice): positions >= POS_B would wrap
    # into the hash bits of the (hash+1)*B - pos encoding, silently
    # breaking the substring-match guarantee. The guard is fused into
    # the __n projection so Catalyst cannot prune it; cost is one
    # length compare per DOC, not per gram.
    norm = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.length(_normalize(F.col(text_col))) >= POS_B,
            F.raise_error(
                F.format_string(
                    "winnow_fingerprints: normalized doc_id=%s has %s chars,"
                    " >= POS_B=%s — chunk upstream (functions/text.py)",
                    F.col(id_col).cast("string"),
                    F.length(_normalize(F.col(text_col))).cast("string"),
                    F.lit(str(POS_B)),
                )
            ),
        )
        .otherwise(_normalize(F.col(text_col)))
        .alias("__n"),
    )
    grams = (
        norm.where(F.length("__n") >= k)
        .select(
            "doc_id",
            F.length("__n").alias("__len"),
            F.explode(F.sequence(F.lit(1), F.length("__n") - k + 1)).alias("pos"),
            F.col("__n"),
        )
        .select(
            "doc_id",
            "__len",
            "pos",
            (
                (gram_hash(F.col("__n").substr(F.col("pos"), F.lit(k))) + 1)
                * F.lit(POS_B)
                - F.col("pos")
            ).alias("__enc"),
        )
    )
    # One streaming per-doc window computes every length-w frame's
    # min; rows past the last FULL window start (or past position 1
    # for short docs) are dropped AFTER the frame evaluation so
    # trailing grams still participate in earlier frames.
    sel_w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("__wmin", F.min("__enc").over(sel_w))
        .where(
            F.col("pos")
            <= F.greatest(F.col("__len") - F.lit(k + w - 2), F.lit(1))
        )
        .select(
            "doc_id",
            (F.lit(POS_B) - F.pmod("__wmin", F.lit(POS_B))).alias("pos"),
            (F.expr(f"__wmin DIV {POS_B}")).alias("fp"),
        )
        .distinct()
    )


def winnow_shared_pairs(
    fingerprints: DataFrame, min_shared: int = 1, max_bucket: int = 64
) -> DataFrame:
    """MOSS candidate pairs: unordered document pairs sharing at least
    ``min_shared`` distinct fingerprint values, with the shared count
    (the MOSS match-score numerator). Join volume is Σ_fp |docs(fp)|²
    — bounded by ``max_bucket``: fingerprints shared by more than
    ``max_bucket`` documents (boilerplate grams) are dropped, the
    exact hot-bucket cap the MinHash LSH band join uses."""
    per_fp = fingerprints.select("doc_id", "fp").distinct()
    hot = (
        per_fp.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("__n_docs"))
        .where(F.col("__n_docs") <= max_bucket)
        .select("fp")
    )
    cold = per_fp.join(hot, "fp")
    left = cold.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    right = cold.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("fp").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def winnow_scalars(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row of exact corpus-level ``wf_*`` LONGs for driver-row
    widening: selection volume, distinct fingerprints, covered docs,
    total gram count, the selection density in nanos (theory:
    ~2/(w+1) ≈ 400M for w=4), shared-pair count and the max pair
    overlap. All counts are exact integers — layout-invariant."""
    fps = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    norm = docs.select(_normalize(F.col(text_col)).alias("__n"))
    gram_totals = norm.agg(
        F.coalesce(
            F.sum(F.greatest(F.length("__n") - F.lit(k - 1), F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("wf_total_grams")
    )
    sel = fps.agg(
        F.count(F.lit(1)).cast("long").alias("wf_selected"),
        F.count_distinct("fp").cast("long").alias("wf_distinct_fps"),
        F.count_distinct("doc_id").cast("long").alias("wf_docs"),
    )
    pairs = winnow_shared_pairs(fps).agg(
        F.count(F.lit(1)).cast("long").alias("wf_shared_pairs"),
        F.coalesce(F.max("shared_fps"), F.lit(0))
        .cast("long")
        .alias("wf_top_pair_shared"),
    )
    return (
        sel.crossJoin(F.broadcast(gram_totals))
        .crossJoin(F.broadcast(pairs))
        .select(
            "wf_selected",
            "wf_distinct_fps",
            "wf_docs",
            "wf_total_grams",
            F.when(
                F.col("wf_total_grams") > 0,
                F.expr("(wf_selected * 1000000000) DIV wf_total_grams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("wf_density_nanos"),
            "wf_shared_pairs",
            "wf_top_pair_shared",
        )
    )
