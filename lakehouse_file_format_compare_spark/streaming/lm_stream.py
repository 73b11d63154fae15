"""Streaming perplexity scoring against a FROZEN bigram-LM model
store (r10): the CCNet-style quality filter (operators/lm.py) as a
production stream.

    train_to_store(reference slice)          # once, offline
    readStream(docs dir) → Trigger.AvailableNow
      → foreachBatch(score batch vs model store → insert-only MERGE)

The model (bigram counts, context totals, vocabulary size) is
trained ONCE on a trusted reference slice and persisted as
snapshot-versioned warehouse tables; each micro-batch joins against
those frozen tables — scoring is stateless per document, so the
drained result is EXACTLY the batch scoring of the full input (no
fold theorem needed: a frozen model makes the map embarrassingly
parallel; proven in tests/test_streaming_lm.py). The keyed
insert-only merge makes replays idempotent ⇒ effectively-once
(checkpointed file progress × idempotent sink — the
dedup_store_stream discipline).

Scale notes (100 TB/day): per micro-batch cost = one bigram explode
of the BATCH + model-bounded joins (the model is Heaps-law small and
broadcasts when it fits; AQE decides) + an O(batch) insert-only COW
merge. Re-training is an offline swap: write a new model store,
point the scorer at it.

The reference has no streaming and no text-quality surface; this
composes the repo's streaming contract (streaming/runner.py) with
the r10 LM operator.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.lm import (
    THETA_NANOS,
    bigram_lm_score,
    bigram_lm_train,
    flag_high_perplexity,
)
from ..storage import Warehouse


@dataclass
class StreamingPerplexityScorer:
    """Drain a file-source stream of documents into a scored + flagged
    table using a frozen LM model store."""

    warehouse: Warehouse
    checkpoint_root: str
    theta_nanos: int = THETA_NANOS
    fmt: str = "parquet"
    id_col: str = "doc_id"
    text_col: str = "text"

    def _model_names(self, name: str) -> tuple[str, str, str]:
        return (f"{name}__lm_model", f"{name}__lm_ctx", f"{name}__lm_vocab")

    def train_to_store(self, train_docs: DataFrame, name: str) -> None:
        """Train the bigram LM on the reference slice and persist it
        (full refresh — retraining swaps the store atomically via the
        warehouse's snapshot commit)."""
        model, ctx_totals, vocab = bigram_lm_train(train_docs, self.text_col)
        mn, cn, vn = self._model_names(name)
        wh = self.warehouse
        wh.write_table(model, "silver", mn, fmt=self.fmt)
        wh.write_table(ctx_totals, "silver", cn, fmt=self.fmt)
        wh.write_table(vocab, "silver", vn, fmt=self.fmt)

    def _model_frames(self, name: str):
        mn, cn, vn = self._model_names(name)
        wh = self.warehouse
        return (
            wh.read_table("silver", mn, self.fmt),
            wh.read_table("silver", cn, self.fmt),
            wh.read_table("silver", vn, self.fmt),
        )

    def score_batch(self, batch: DataFrame, name: str) -> DataFrame:
        """(id, n_bigrams, lp_nanos, flagged) for one batch against
        the frozen store — the exact operators/lm.py arithmetic."""
        model, ctx_totals, vocab = self._model_frames(name)
        return flag_high_perplexity(
            bigram_lm_score(
                batch, model, ctx_totals, vocab,
                self.text_col, self.id_col,
            ),
            self.theta_nanos,
        )

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

        def score(batch_df, batch_id: int) -> None:
            scored = self.score_batch(
                batch_df.select(self.id_col, self.text_col), name
            )
            # keyed insert-only merge: a replayed batch re-merges the
            # same ids with the same frozen-model scores — no-op
            wh.merge_table(
                scored, "silver", f"{name}__lm_scores",
                keys=[self.id_col], fmt=self.fmt, policy="insert_only",
            )

        query = (
            stream.writeStream.foreachBatch(score)
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_root, f"{name}__lm"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)

    def flagged_rate(self, name: str) -> DataFrame:
        """One row: scored docs / flagged docs over the drained table
        (the monitoring statistic a production feed alerts on)."""
        t = self.warehouse.read_table(
            "silver", f"{name}__lm_scores", self.fmt
        )
        return t.agg(
            F.count(F.lit(1)).cast("long").alias("scored_docs"),
            F.sum(F.col("flagged").cast("long")).cast("long").alias(
                "flagged_docs"
            ),
        )
