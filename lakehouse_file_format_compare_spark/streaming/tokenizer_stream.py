"""Streaming tokenizer-budget monitor (r10 late-round): the fixed
unigram-Viterbi and WordPiece-greedy tokenizers (operators/vocab.py)
as a production stream —

    readStream(docs dir) → Trigger.AvailableNow
      → foreachBatch(tokenize batch under the LITERAL model
                     → insert-only MERGE of per-doc token budgets)

This is the feed a training-data pipeline alerts on: token counts
decide packing and cost, and the uv/wp cost delta (greedy-vs-optimal
gap) widening on real traffic flags vocabulary drift — new domains
make greedy fall into longest-match cost traps more often.

The model is a code-level literal (piece → integer nano cost, the
plans/text_plans.py UV_VOCAB deployment shape), so scoring is
STATELESS per document: the drained result is exactly the batch
tokenization of the full input, and the keyed insert-only merge
makes replays idempotent ⇒ effectively-once (the lm_stream /
dedup_store_stream discipline).

Scale notes (100 TB/day): per micro-batch cost = one word explode of
the BATCH, the DP folds over the batch's Heaps-small distinct-word
table, and an O(batch) insert-only COW merge. Retuning the model is
a code deploy, not a state migration.

The reference has no streaming and no text surface; this composes
the repo's streaming contract with the tokenizer-apply family.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.vocab import unigram_apply, wordpiece_apply
from ..storage import Warehouse


@dataclass
class StreamingTokenizerMonitor:
    """Drain a file-source stream of documents into a per-doc
    token-budget table under fixed literal tokenizer models."""

    warehouse: Warehouse
    checkpoint_root: str
    vocab: dict = field(default_factory=dict)
    oov_char_nanos: int = 5_000_000_000
    longword_nanos: int = 50_000_000_000
    fmt: str = "parquet"
    id_col: str = "doc_id"
    text_col: str = "text"

    def score_batch(self, batch: DataFrame) -> DataFrame:
        """(id, n_words, n_uv_tokens, uv_cost_nanos, n_wp_tokens,
        wp_cost_micros) for one batch — the exact operators/vocab.py
        arithmetic under both apply rules."""
        uv = unigram_apply(
            batch, self.vocab, self.oov_char_nanos, self.longword_nanos,
            text_col=self.text_col, id_col=self.id_col,
        )
        wp = wordpiece_apply(
            batch, self.vocab, self.oov_char_nanos, self.longword_nanos,
            text_col=self.text_col, id_col=self.id_col,
        ).select(self.id_col, "n_wp_tokens", "wp_cost_micros")
        return uv.join(wp, self.id_col)

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
                batch_df.select(self.id_col, self.text_col)
            )
            # keyed insert-only merge: a replayed batch re-merges the
            # same ids with the same literal-model budgets — no-op
            wh.merge_table(
                scored, "silver", f"{name}__tok_budgets",
                keys=[self.id_col], fmt=self.fmt, policy="insert_only",
            )

        query = (
            stream.writeStream.foreachBatch(score)
            .option(
                "checkpointLocation",
                os.path.join(self.checkpoint_root, f"{name}__tok"),
            )
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)

    def budget_report(self, name: str) -> DataFrame:
        """One row over the drained table: docs, words, both token
        totals and the exact greedy-gap (Σ wp_cost_micros·1000 −
        Σ uv_cost_nanos ≥ 0 — Viterbi is optimal, so a NEGATIVE gap
        is a model/engine bug, and a GROWING one is vocabulary
        drift). The alerting aggregate."""
        t = self.warehouse.read_table(
            "silver", f"{name}__tok_budgets", self.fmt
        )
        return t.agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_words").cast("long").alias("words"),
            F.sum("n_uv_tokens").cast("long").alias("uv_tokens"),
            F.sum("n_wp_tokens").cast("long").alias("wp_tokens"),
            (
                F.sum(F.col("wp_cost_micros")) * F.lit(1000)
                - F.sum(F.col("uv_cost_nanos"))
            ).cast("long").alias("greedy_gap_nanos"),
        )
