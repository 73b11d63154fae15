"""Streaming filter-evaluation monitor (r10 continuation): the exact
Mann-Whitney ROC-AUC (operators/evaluation.py) maintained over a live
feed of scored-and-labeled rows.

    readStream(scored dir) → Trigger.AvailableNow
      → foreachBatch(per-score (pos, neg) counts → insert-only MERGE
                     keyed by (batch_key, score))
    auc()  — re-aggregate the count store, auc_from_counts

Why this decomposition is exact: the AUC reduces to GROUPED per-score
class counts, and counts are ADDITIVE — so folding each micro-batch's
(score → pos, neg) table into a store and re-aggregating gives
bit-identical results to scoring the full input at once (no
approximation, no decay, no sketch). The store is keyed by
``(batch_key, score)`` with an insert-only merge: a replayed batch
re-inserts the same keys and is a no-op, so counts are never doubled
(checkpointed file progress x idempotent sink — the
dedup_store_stream / lm_stream discipline; effectively-once).

Scale notes (100 TB/day): per micro-batch cost = one groupBy of the
BATCH (map-side combined) + an O(distinct batch scores) insert-only
COW merge; the store grows with Σ per-batch distinct scores, bounded
by quantizing the score upstream (it is already a fixed-point LONG in
every producer in this repo). The cumulative AUC read is
store-sized, never corpus-sized.

The reference has no streaming and no evaluation surface; this
composes the repo's streaming contract with the r10 evaluation
operator family.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.evaluation import auc_from_counts, full_eval_from_counts
from ..storage import Warehouse


@dataclass
class StreamingAucMonitor:
    """Fold a file-source stream of ``(score, label)`` rows into a
    mergeable per-score count store; serve the exact cumulative AUC."""

    warehouse: Warehouse
    checkpoint_root: str
    fmt: str = "parquet"
    score_col: str = "score"
    label_col: str = "label"

    def _counts_name(self, name: str) -> str:
        return f"{name}__eval_counts"

    def fold_batch(self, batch: DataFrame, batch_id: int, name: str) -> None:
        """One micro-batch → per-score class counts, merged insert-only
        under the batch's own key (replay no-op)."""
        counts = (
            batch.select(
                F.col(self.score_col).cast("long").alias("s"),
                F.col(self.label_col).cast("long").alias("y"),
            )
            .groupBy("s")
            .agg(
                F.sum("y").cast("long").alias("pos"),
                F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
            )
            .select(F.lit(batch_id).cast("long").alias("batch_key"), "s", "pos", "neg")
        )
        self.warehouse.merge_table(
            counts,
            "silver",
            self._counts_name(name),
            keys=["batch_key", "s"],
            fmt=self.fmt,
            policy="insert_only",
        )

    def run(
        self,
        source_path: str,
        name: str,
        schema: StructType,
        timeout_sec: int = 180,
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
                os.path.join(self.checkpoint_root, f"{name}__eval"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)

    def counts(self, name: str) -> DataFrame:
        return self.warehouse.read_table(
            "silver", self._counts_name(name), self.fmt
        )

    def auc(self, name: str) -> DataFrame:
        """The exact cumulative AUC over everything drained so far —
        bit-identical to auc_report on the full input."""
        return auc_from_counts(self.counts(name))

    def full_eval(self, name: str) -> DataFrame:
        """The full fused evaluation (AUC + KS + threshold selection)
        over everything drained so far — bit-identical to
        full_eval_report on the full input."""
        return full_eval_from_counts(self.counts(name))

    def calibration(self, name: str, n_bins: int = 32) -> DataFrame:
        """Isotonic calibration curve (r11) over everything drained so
        far — bit-identical to isotonic_calibrate_bins on the full
        input (operators/evaluation.py; the same mergeable count
        store serves ranking, separation, threshold AND calibration
        with no raw-score re-read)."""
        from ..operators.evaluation import isotonic_calibrate_from_counts

        return isotonic_calibrate_from_counts(
            self.counts(name), n_bins=n_bins
        )

    def calibrated_drift(self, name: str, n_bins: int = 32) -> DataFrame:
        """r12 (r11 verdict #5): per-micro-batch PSI of the CALIBRATED
        score distribution against the cumulative one — the
        production loop (score → calibrate → monitor) served entirely
        from the count store: the isotonic curve is fitted on the
        drained cumulative counts, every (batch, score) count maps
        through it, and a batch whose calibrated P(label=1) mix has
        shifted surfaces as a high psi_nanos. Bit-equal to the
        row-grain path (calibrate then psi_nanos per batch), pinned
        in tests/test_streaming_eval.py."""
        from ..operators.evaluation import calibrated_drift_from_counts

        return calibrated_drift_from_counts(self.counts(name), n_bins=n_bins)
