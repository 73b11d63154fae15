"""Streaming end-to-end corpus build (r12): the incremental
corpus-pipeline fold (operators/corpus_fold.py) lifted to Structured
Streaming — the production shape where a crawl feed becomes a deduped,
LM-filtered, decontaminated, split-and-packable corpus continuously.

    readStream(docs dir) → Trigger.AvailableNow
      → foreachBatch(corpus_fold_batch vs the warehouse-backed stores
                     → insert-only MERGE the kept docs + store DELTAS)

Commit order per micro-batch is REVERSE dependency order (r12
advisor, high): kept docs and the derived stores (ledger, manifest,
split pairs, kept signatures) first, then signatures, then
fingerprints LAST — each store's delta derivation depends only on
stores committed AFTER it, so a crash between any two merges leaves
every already-committed store's inputs untouched. Combined with the
batch-id scrub inside corpus_fold_batch (doc-keyed stores are
anti-joined against the batch before any history join), a replayed
batch re-derives byte-identical deltas from ANY partial-commit
state, and every merge is keyed insert-only — re-inserts are no-ops,
so the pipeline is effectively-once end to end (checkpointed file
progress × idempotent sinks). The fingerprint store is the one store
that cannot be scrubbed (it is text-keyed: a genuine earlier-batch
exact dup shares the fp), which is exactly why it commits last —
no replay window ever observes this batch's fps.
Proven in tests/test_streaming_corpus_build.py::test_crash_replay
by killing the batch at every commit boundary.

Serving: ``splits()`` / ``packs()`` / ``datasheet()`` re-derive the
global artifacts from the TEXT-FREE store tables at any point — the
batch fold functions over a state read back from the warehouse, so
drained == batch (proven over real AvailableNow drains in
tests/test_streaming_corpus_build.py via the corpus_fold
batching-invariance theorem).

The frozen LM model and the eval fixture are pipeline CONFIG (the
CCNet deployment shape): train/choose them once, pass the frames in.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.corpus_fold import (
    CorpusFoldState,
    corpus_fold_batch,
    fold_datasheet,
    fold_packs,
    fold_splits,
)
from ..storage import Warehouse

#: (store suffix, fold-state field, merge keys) in COMMIT ORDER after
#: the kept docs — REVERSE dependency order (module note): derived
#: stores first, then sigs, then fps LAST (the only unscrubbable one)
_STORES = (
    # drop ledger: (doc_id, reason) — a doc drops at most once across
    # the whole build (batches are disjoint), so doc_id keys it
    ("ledger", "ledger", ["doc_id"]),
    ("manifest", "manifest", ["doc_id"]),
    ("pairs", "pair_store", ["doc_a", "doc_b"]),
    ("keptsigs", "kept_sigs", ["doc"]),
    ("sigs", "sig_store", ["doc"]),
    ("fps", "fp_store", ["fp"]),
)


@dataclass
class StreamingCorpusBuildLoader:
    """Drain a file-source document stream into a fully-built corpus:
    kept docs table + the six text-free fold stores (incl. the
    (doc_id, reason) drop ledger — per-doc attribution of why a
    document left the build)."""

    warehouse: Warehouse
    checkpoint_root: str
    lm_model: tuple[DataFrame, DataFrame, DataFrame] | None = None
    eval_docs: DataFrame | None = None
    threshold: float = 0.5
    split_threshold: float = 0.35
    num_hashes: int = 32
    bands: int = 8
    k: int = 3
    decon_n: int = 8
    theta_nanos: int | None = None
    fmt: str = "parquet"
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    #: signature-store retention in batches (operators/lifecycle.py):
    #: when set, sig rows carry (batch_id, kept) and every micro-batch
    #: ends with a compaction DELETE of dropped-doc rows older than
    #: the horizon. Cannot change for an existing store (the fold
    #: raises a descriptive error — the dedup_store_stream guard).
    horizon: int | None = None
    weights: dict[str, float] = field(
        default_factory=lambda: {"train": 0.8, "val": 0.1, "test": 0.1}
    )

    def _read_state(self, name: str) -> CorpusFoldState:
        # Missing-store detection is an explicit EXISTENCE check, not a
        # broad except (r12 advisor, medium): a transient read failure
        # on batch N>0 must fail the micro-batch (the streaming query
        # retries it) — silently folding with empty state would
        # re-admit exact/near duplicates of the entire history.
        frames = {}
        for suffix, fld, _ in _STORES:
            if self.warehouse.exists("silver", f"{name}__{suffix}", self.fmt):
                frames[fld] = self.warehouse.read_table(
                    "silver", f"{name}__{suffix}", self.fmt
                )
            else:
                frames[fld] = None  # first batch: no store yet
        return CorpusFoldState(**frames)

    def fold_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        name: str,
        _crash_after: int | None = None,
    ) -> None:
        """Fold one micro-batch and commit kept docs + store deltas in
        reverse dependency order (module note). ``_crash_after`` is a
        TEST hook: commit only the first N merges then raise — the
        crash-replay test uses it to kill the batch at every commit
        boundary and prove the replay converges."""
        state = self._read_state(name)
        kept, new_state = corpus_fold_batch(
            batch,
            state,
            lm_model=self.lm_model,
            eval_docs=self.eval_docs,
            threshold=self.threshold,
            split_threshold=self.split_threshold,
            num_hashes=self.num_hashes,
            bands=self.bands,
            k=self.k,
            decon_n=self.decon_n,
            theta_nanos=self.theta_nanos,
            id_col=self.id_col,
            text_col=self.text_col,
            lang_col=self.lang_col,
            batch_id=batch_id,
            horizon=self.horizon,
        )
        # pin the batch's derived frames once: every store merge below
        # reads them without re-running the fold chain
        kept = kept.localCheckpoint(eager=True)
        delta = new_state.delta
        # kept docs first — corpus_fold_batch canonicalizes the id
        # column to 'doc_id' (_clean_batch), so every store INCLUDING
        # the kept table is keyed by the canonical name regardless of
        # the loader's id_col (r12 advisor, low)
        commits = [(name, ["doc_id"], kept)] + [
            (f"{name}__{suffix}", keys, getattr(delta, fld))
            for suffix, fld, keys in _STORES
        ]
        for i, (tbl, keys, rows) in enumerate(commits):
            if _crash_after is not None and i >= _crash_after:
                raise RuntimeError(
                    f"injected crash before commit #{i} ({tbl})"
                )
            if rows is not kept:
                rows = rows.localCheckpoint(eager=True)
            self.warehouse.merge_table(
                rows, "silver", tbl,
                keys=keys, fmt=self.fmt, policy="insert_only",
            )
        if self.horizon is not None:
            # compaction last: a pure shrink, idempotent on replay
            self.warehouse.delete_from(
                "silver", f"{name}__sigs",
                f"(NOT kept) AND batch_id <= {int(batch_id) - self.horizon}",
                fmt=self.fmt,
            )

    def run(
        self,
        source_path: str,
        name: str,
        schema: StructType,
        timeout_sec: int = 300,
        max_files_per_trigger: int | None = None,
    ) -> None:
        reader = self.warehouse.spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        stream = reader.parquet(source_path)
        query = (
            stream.writeStream.foreachBatch(
                lambda b, bid: self.fold_batch(b, bid, name)
            )
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_root, f"{name}__corpus"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)

    # -- serving: global artifacts from the drained text-free stores --

    def state(self, name: str) -> CorpusFoldState:
        return self._read_state(name)

    def splits(self, name: str, portable: bool = False) -> DataFrame:
        return fold_splits(self.state(name), self.weights, portable=portable)

    def packs(
        self, name: str, budget: int, groups: int = 1, portable: bool = False
    ) -> DataFrame:
        return fold_packs(
            self.state(name), self.weights, budget, groups, portable=portable
        )

    def datasheet(self, name: str) -> DataFrame:
        return fold_datasheet(self.state(name))
