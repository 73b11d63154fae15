"""Signature-store lifecycle: retention + compaction for the
incremental dedup stores (r10 verdict #3).

The incremental MinHash / embedding / SemDeDup folds
(operators/dedup.py) persist a signature row for EVERY document —
kept and dropped alike — because indexing dropped docs is what makes
``fold == one full run`` (a full run's pair graph includes dropped
docs; see the chain counterexample in tests/test_incremental_dedup).
At daily-crawl scale that store grows monotonically and the dropped
rows — pure chain-evidence, never part of the corpus — become the
dominant tablespace.

This module adds the vacuum discipline (mirroring storage.py's
snapshot vacuum: bounded history, documented weaker guarantee):

- a MANAGED store = the family's store columns plus ``batch_id``
  (LONG, caller-supplied, monotone per fold step) and ``kept``
  (BOOLEAN lifecycle flag);
- ``compact_store`` tombstones dropped-doc rows once they age past a
  retention ``horizon`` (in batches). Kept rows are the corpus index
  and live forever.

Fold guarantee under compaction (the honest, tested statement):

- ``horizon=None`` (or >= number of batches seen): the managed fold
  is EXACTLY the unmanaged fold == one full run over all batches.
- finite ``horizon=H``: a new document's verdict matches the full
  run whenever at least one of its full-run matches is (a) a KEPT
  doc — kept rows are never compacted — or (b) any doc first seen
  within the last ``H`` batches. The ONLY divergence is the long
  chain: a doc ALL of whose matches are fold-dropped docs older than
  ``H`` batches is kept by the managed fold and dropped by the full
  run (exactness within the retention horizon; the
  tests/test_store_lifecycle.py chain counterexample demonstrates
  both sides).

Store size under a stationary drop rate is bounded:
``|kept docs| + H * (drops per batch)`` — the scale contract pinned
in tests/test_store_lifecycle.py — versus the unmanaged store's
``|all docs ever seen|``.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no dedup surface (dags/ are format-comparison ETL); extension
surface per the training-data-pipeline brief (SURVEY §2 extensions),
vacuum discipline mirrored from this repo's storage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp_batch(
    store_rows: DataFrame,
    batch_id: int,
    kept_ids: DataFrame,
    key_col: str,
) -> DataFrame:
    """Annotate one batch's store rows with lifecycle columns:
    ``batch_id`` (literal) and ``kept`` (True iff the row's
    ``key_col`` appears in ``kept_ids``, whose single column must be
    named ``key_col`` too). Broadcast-or-shuffle left join keyed on
    the id — the same cost class as the fold's own anti-join."""
    flags = kept_ids.select(key_col).distinct().withColumn(
        "__kept", F.lit(True)
    )
    return (
        store_rows.join(flags, key_col, "left")
        .withColumn("kept", F.coalesce(F.col("__kept"), F.lit(False)))
        .drop("__kept")
        .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    )


def compact_store(
    managed: DataFrame,
    current_batch_id: int,
    horizon: int | None,
) -> DataFrame:
    """Retention pass: drop tombstoned rows (``kept = false``) whose
    ``batch_id <= current_batch_id - horizon``. Kept rows always
    survive. ``horizon=None`` is a no-op (the exact-fold store). A
    pure filter — partition-prunable when the store is written
    partitioned by ``batch_id``, no shuffle."""
    if horizon is None:
        return managed
    if horizon < 1:
        raise ValueError("horizon must be >= 1 batch (or None)")
    cutoff = int(current_batch_id) - int(horizon)
    return managed.where(F.col("kept") | (F.col("batch_id") > cutoff))


def store_lifecycle_report(managed: DataFrame) -> DataFrame:
    """One exact-LONG observability row: total rows, kept rows,
    tombstones (dropped rows awaiting compaction), oldest/newest
    batch — what a retention dashboard plots per fold step."""
    return managed.agg(
        F.count(F.lit(1)).cast("long").alias("store_rows"),
        F.coalesce(F.sum(F.col("kept").cast("long")), F.lit(0))
        .cast("long")
        .alias("kept_rows"),
        F.coalesce(F.sum((~F.col("kept")).cast("long")), F.lit(0))
        .cast("long")
        .alias("tombstone_rows"),
        F.coalesce(F.min("batch_id"), F.lit(-1)).cast("long").alias(
            "oldest_batch"
        ),
        F.coalesce(F.max("batch_id"), F.lit(-1)).cast("long").alias(
            "newest_batch"
        ),
    )


def incremental_minhash_dedup_managed(
    new_docs: DataFrame,
    managed_store: DataFrame | None,
    batch_id: int,
    horizon: int | None = None,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
    new_sigs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`dedup.incremental_minhash_dedup` with lifecycle
    management: the returned store carries ``(doc, signature,
    batch_id, kept)`` and is compacted to ``horizon`` before being
    handed back. The batch is signed exactly once (lazy
    localCheckpoint — the einc_* discipline: the signatures feed the
    candidate join, the est verification, the stamp join AND the
    store union) and the kept-id set is checkpointed too so stamping
    does not re-run the dedup plan. ``new_sigs`` (optional, r12):
    the batch's precomputed signature frame — callers that reuse the
    signatures elsewhere (the corpus fold's split-pair index) pass it
    to avoid signing twice."""
    from .dedup import incremental_minhash_dedup, minhash_signatures

    if new_sigs is None:
        new_sigs = minhash_signatures(
            docs=new_docs, num_hashes=num_hashes, k=k,
            id_col=id_col, text_col=text_col,
        ).localCheckpoint(eager=False)
    history = (
        None if managed_store is None
        else managed_store.select("doc", "signature")
    )
    kept, _ = incremental_minhash_dedup(
        new_docs, history, threshold=threshold, num_hashes=num_hashes,
        bands=bands, k=k, id_col=id_col, text_col=text_col,
        max_bucket_size=max_bucket_size, new_sigs=new_sigs,
    )
    kept_ids = kept.select(id_col).localCheckpoint(eager=False)
    stamped = stamp_batch(
        new_sigs, batch_id, kept_ids.select(F.col(id_col).alias("doc")), "doc"
    )
    merged = (
        stamped if managed_store is None
        else managed_store.unionByName(stamped)
    )
    out_store = compact_store(merged, batch_id, horizon)
    return new_docs.join(kept_ids, id_col, "left_semi"), out_store


def _managed_bucket_fold(
    new_embeddings: DataFrame,
    managed_store: DataFrame | None,
    new_rows: DataFrame,
    batch_id: int,
    horizon: int | None,
    threshold: float,
    max_bucket_size: int | None,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared managed skeleton over (vid, vec, buckets) stores."""
    from .dedup import _inc_bucket_dedup

    # checkpoint BEFORE _inc_bucket_dedup so the stamp below reuses
    # the same materialized rows (its internal checkpoint wraps the
    # frame it was given — this one)
    new_rows = new_rows.localCheckpoint(eager=False)
    history = (
        None if managed_store is None
        else managed_store.select("vid", "vec", "buckets")
    )
    dropped, _ = _inc_bucket_dedup(
        new_rows, history, threshold, max_bucket_size
    )
    dropped = dropped.localCheckpoint(eager=False)
    kept_vids = new_rows.select("vid").join(dropped, "vid", "left_anti")
    stamped = stamp_batch(new_rows, batch_id, kept_vids, "vid")
    merged = (
        stamped if managed_store is None
        else managed_store.unionByName(stamped)
    )
    out_store = compact_store(merged, batch_id, horizon)
    kept = new_embeddings.join(
        dropped.select(F.col("vid").alias(id_col)), id_col, "left_anti"
    )
    return kept, out_store


def incremental_embedding_dedup_managed(
    new_embeddings: DataFrame,
    managed_store: DataFrame | None,
    batch_id: int,
    horizon: int | None = None,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """:func:`dedup.incremental_embedding_dedup` with lifecycle
    management (store schema ``(vid, vec, buckets, batch_id,
    kept)``)."""
    from .dedup import embedding_signature_store

    new_rows = embedding_signature_store(
        new_embeddings, bits=bits, tables=tables, dim=dim, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    return _managed_bucket_fold(
        new_embeddings, managed_store, new_rows, batch_id, horizon,
        threshold, max_bucket_size, id_col,
    )


def incremental_semantic_dedup_managed(
    new_embeddings: DataFrame,
    managed_store: DataFrame | None,
    centroids: list[list[float]],
    batch_id: int,
    horizon: int | None = None,
    threshold: float = 0.95,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """:func:`dedup.incremental_semantic_dedup` with lifecycle
    management — frozen centroids, exact-cosine verification, so the
    retention-horizon guarantee (module docstring) is exercised
    DETERMINISTICALLY (no LSH recall noise): the chain-counterexample
    test uses this path."""
    from .dedup import semantic_store

    new_rows = semantic_store(new_embeddings, centroids, id_col, vec_col)
    return _managed_bucket_fold(
        new_embeddings, managed_store, new_rows, batch_id, horizon,
        threshold, max_cluster_size, id_col,
    )
