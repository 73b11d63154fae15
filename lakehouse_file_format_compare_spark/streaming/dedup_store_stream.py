"""Streaming incremental near-dup dedup against a persistent
signature store (r10): the batch fold
(operators/dedup.py::incremental_minhash_dedup, r9) lifted to
Structured Streaming.

    readStream(docs dir) → Trigger.AvailableNow
      → foreachBatch(dedup batch vs store → insert-only MERGE both)

Each micro-batch is deduped against the snapshot-versioned signature
store (storage.py) of everything seen, then BOTH outputs commit as
keyed insert-only merges: the kept documents and the batch's
signatures (dropped docs' signatures included — the fold-commutes
invariant). Keyed insert-only merges make replays idempotent: a batch
re-delivered after a checkpoint rollback re-merges the same keys and
changes nothing, so the pipeline is effectively-once end to end
(checkpointed file progress × idempotent sink).

Semantics: a doc is dropped iff est-Jaccard links it to ANY
previously seen doc or any smaller-id doc of its own micro-batch.
When files arrive in id order (the natural crawl/export shape) the
drained result is EXACTLY the one-shot full-run kept set — the
batch-fold theorem, proven over the stream in
tests/test_streaming_incremental_dedup.py with maxFilesPerTrigger=1.

Scale notes (100 TB): per micro-batch cost = shingle+sign the batch
(corpus-linear in the BATCH only) + band-bucket joins against the
store's exploded longs + the insert-only merges (O(batch) COW). The
store carries ~num_hashes longs per doc ever seen; history text is
never re-read. The reference has no streaming and no dedup surface
(SURVEY §2.5/§2.9); this composes the repo's streaming contract
(streaming/runner.py) with the r9 incremental operator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.types import StructType

from ..operators.dedup import incremental_minhash_dedup, signature_store
from ..storage import Warehouse


@dataclass
class StreamingIncrementalDedupLoader:
    """Drain a file-source stream of documents into a deduped table
    plus a signature store, micro-batch by micro-batch.

    ``horizon`` (r11, operators/lifecycle.py): when set, the store
    rows carry (batch_id, kept) lifecycle columns and every
    micro-batch ends with a compaction DELETE of dropped-doc rows
    older than ``horizon`` batches — the retention discipline that
    keeps the store at |kept| + horizon-window tombstones instead of
    every-doc-ever. Replay-safe: foreachBatch batch ids are stable
    across checkpoint replays, the insert-only merge ignores
    re-inserted keys (flags cannot flip), and re-deleting aged
    tombstones is a no-op. The fold guarantee weakens exactly as
    documented in operators/lifecycle.py: exact within the retention
    horizon.

    ``horizon`` cannot change for an EXISTING store: managed stores
    carry (batch_id, kept), unmanaged ones don't, and mixing the two
    row shapes in one table would fail late inside a merge/DELETE with
    an opaque schema error. The first micro-batch checks the existing
    store's schema against the configured mode and raises a
    descriptive error instead (r11 advice)."""

    warehouse: Warehouse
    checkpoint_root: str
    threshold: float = 0.5
    num_hashes: int = 32
    bands: int = 8
    k: int = 3
    fmt: str = "parquet"
    id_col: str = "doc_id"
    text_col: str = "text"
    horizon: int | None = None

    def _store_name(self, name: str) -> str:
        return f"{name}_sigstore"

    def run(
        self,
        source_path: str,
        name: str,
        schema: StructType,
        timeout_sec: int = 180,
        max_files_per_trigger: int | None = None,
    ) -> None:
        wh = self.warehouse
        reader = wh.spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        stream = reader.parquet(source_path)

        def dedup_batch(batch_df, batch_id: int) -> None:
            batch = batch_df.select(self.id_col, self.text_col)
            try:
                history = wh.read_table("silver", self._store_name(name), self.fmt)
            except Exception:
                history = None  # first batch: no store yet
            if history is not None:
                # mode guard (r11 advice): a managed store has
                # (batch_id, kept); toggling `horizon` against an
                # existing store would otherwise fail late with an
                # opaque schema error inside the merge or the
                # compaction DELETE.
                managed_store = {"batch_id", "kept"} <= set(history.columns)
                if (self.horizon is not None) != managed_store:
                    raise ValueError(
                        f"signature store '{self._store_name(name)}' was "
                        f"created with horizon "
                        f"{'set' if managed_store else 'unset'} but this "
                        f"loader has horizon={self.horizon!r}; `horizon` "
                        "cannot change for an existing store — drain into "
                        "a new store name or rebuild it"
                    )
                if self.horizon is not None:
                    history = history.select("doc", "signature")
            # materialized once (eager localCheckpoint): the dedup's
            # bucket joins AND the store merge both read it without
            # re-shingling the batch
            new_sigs = signature_store(
                batch, self.num_hashes, self.k, self.id_col, self.text_col
            ).localCheckpoint(eager=True)
            kept, _ = incremental_minhash_dedup(
                batch,
                history,
                threshold=self.threshold,
                num_hashes=self.num_hashes,
                bands=self.bands,
                k=self.k,
                id_col=self.id_col,
                text_col=self.text_col,
                new_sigs=new_sigs,
            )
            # order matters for crash safety: commit the KEPT rows
            # first — if the store commit then fails, a replayed batch
            # re-drops the same docs (history can only have grown) and
            # the insert-only merge ignores the re-inserts; committing
            # the store first could instead suppress a kept doc on
            # replay (its own signature would read as "history").
            wh.merge_table(
                kept, "silver", name,
                keys=[self.id_col], fmt=self.fmt, policy="insert_only",
            )
            store_rows = new_sigs
            if self.horizon is not None:
                from ..operators.lifecycle import stamp_batch

                from pyspark.sql import functions as F

                store_rows = stamp_batch(
                    new_sigs,
                    batch_id,
                    kept.select(F.col(self.id_col).alias("doc")),
                    "doc",
                ).localCheckpoint(eager=True)  # flags computed BEFORE
                # the store merge below changes what "history" means
            wh.merge_table(
                store_rows, "silver", self._store_name(name),
                keys=["doc"], fmt=self.fmt, policy="insert_only",
            )
            if self.horizon is not None:
                # compaction last: a pure shrink, idempotent on replay
                wh.delete_from(
                    "silver", self._store_name(name),
                    f"(NOT kept) AND batch_id <= {int(batch_id) - self.horizon}",
                    fmt=self.fmt,
                )

        query = (
            stream.writeStream.foreachBatch(dedup_batch)
            .option(
                "checkpointLocation", os.path.join(self.checkpoint_root, name)
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)


@dataclass
class StreamingEmbeddingDedupLoader:
    """The semantic-path twin (r10): a stream of embedding rows
    deduped against the persistent (vid, vec, buckets) store —
    incremental_embedding_dedup per micro-batch, the same
    effectively-once two-merge commit as the MinHash loader (kept
    rows first, then the batch's store rows including dropped
    vectors'). Per micro-batch the Arrow signature matmul runs ONCE
    (precomputed store rows passed through); history enters as
    exploded stored longs, never re-signed."""

    warehouse: Warehouse
    checkpoint_root: str
    threshold: float = 0.95
    bits: int = 8
    tables: int = 6
    dim: int = 64
    seed: int = 42
    fmt: str = "parquet"
    id_col: str = "vec_id"
    vec_col: str = "embedding"

    def _store_name(self, name: str) -> str:
        return f"{name}_vecstore"

    def run(
        self,
        source_path: str,
        name: str,
        schema: StructType,
        timeout_sec: int = 180,
        max_files_per_trigger: int | None = None,
    ) -> None:
        from ..operators.dedup import (
            embedding_signature_store,
            incremental_embedding_dedup,
        )

        wh = self.warehouse
        reader = wh.spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        stream = reader.parquet(source_path)

        def dedup_batch(batch_df, batch_id: int) -> None:
            batch = batch_df.select(self.id_col, self.vec_col)
            try:
                history = wh.read_table("silver", self._store_name(name), self.fmt)
            except Exception:
                history = None
            # materialized once (eager localCheckpoint): one Arrow
            # matmul per batch for BOTH the dedup and the store merge
            new_rows = embedding_signature_store(
                batch, bits=self.bits, tables=self.tables, dim=self.dim,
                seed=self.seed, id_col=self.id_col, vec_col=self.vec_col,
            ).localCheckpoint(eager=True)
            kept, _ = incremental_embedding_dedup(
                batch, history, threshold=self.threshold,
                bits=self.bits, tables=self.tables, dim=self.dim,
                seed=self.seed, id_col=self.id_col, vec_col=self.vec_col,
                new_rows=new_rows,
            )
            wh.merge_table(
                kept, "silver", name,
                keys=[self.id_col], fmt=self.fmt, policy="insert_only",
            )
            wh.merge_table(
                new_rows, "silver", self._store_name(name),
                keys=["vid"], fmt=self.fmt, policy="insert_only",
            )

        query = (
            stream.writeStream.foreachBatch(dedup_batch)
            .option(
                "checkpointLocation", os.path.join(self.checkpoint_root, name)
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
