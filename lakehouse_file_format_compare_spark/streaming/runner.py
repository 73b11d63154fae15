"""Structured Streaming silver loader.

The reference has no true streaming (SURVEY §2.9): its contract is
cron micro-batches + high-watermark filter + keyed MERGE
(dags/2_bronze_to_silver.py:205-293) with max_active_runs=1 as the
concurrency lock. The Spark-native equivalent is exactly:

    readStream(bronze dir) → Trigger.AvailableNow
      → foreachBatch(keep_latest + merge)

AvailableNow drains whatever bronze files exist and stops — the cron
cadence becomes "invoke run() on whatever schedule you like", with
checkpointing replacing the watermark probe (exactly-once file
progress instead of at-least-once timestamp filtering: strictly
stronger than the reference's contract).

Scale notes (100 TB): file-source streaming scales by listing only
new files (checkpointed log); foreachBatch merges are incremental and
keyed, so each micro-batch costs O(batch + matched partitions), never
O(table). For continuous (non-AvailableNow) operation the same runner
works with a processingTime trigger.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..operators.merge import keep_latest
from ..schemas import FINTECH_TABLE_CONFIGS
from ..storage import Warehouse


@dataclass
class StreamingSilverLoader:
    warehouse: Warehouse
    checkpoint_root: str
    fmt: str = "parquet"
    bronze_fmt: str = "csv"
    max_files_per_trigger: int | None = None

    def run_table(self, name: str, timeout_sec: int = 120) -> None:
        """Drain all unprocessed bronze files for one table into its
        silver table (AvailableNow), merging per the table's policy.
        ``max_files_per_trigger`` bounds each micro-batch (backpressure
        for large backlogs — AvailableNow still drains everything, in
        several batches instead of one)."""
        cfg = FINTECH_TABLE_CONFIGS[name]
        bronze_path = self.warehouse.path("bronze", name, self.bronze_fmt)
        reader = self.warehouse.spark.readStream.schema(cfg.schema).option("header", "true")
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        stream = reader.csv(bronze_path)

        def merge_batch(batch_df, batch_id: int) -> None:
            staged = batch_df.drop("batch_id")
            staged = keep_latest(
                staged, list(cfg.key_columns), ["ingestion_timestamp"] + list(cfg.key_columns)
            )
            self.warehouse.merge_table(
                staged,
                "silver",
                name,
                keys=cfg.key_columns,
                fmt=self.fmt,
                policy=cfg.merge_policy,
                schema=cfg.schema,
            )

        query = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint_root, name))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)

    def run(self, tables: tuple[str, ...] | None = None) -> None:
        for name in tables or tuple(FINTECH_TABLE_CONFIGS):
            self.run_table(name)


@dataclass
class StreamingScd2Loader:
    """Streaming SCD Type-2 dimension maintenance (r7): a file-source
    stream of dimension updates drained with AvailableNow, each
    micro-batch applied through ``Warehouse.scd2_table`` — the same
    foreachBatch + checkpoint contract as the silver loader, so
    exactly-once file progress composes with the snapshot-versioned
    history commits. Within a micro-batch, ``keep_latest`` on the
    effective column enforces the one-row-per-key MERGE precondition
    (intermediate same-batch versions collapse to the newest — the
    standard MERGE-grade behavior; per-event history would use a
    smaller trigger).

    Scale: each micro-batch costs O(batch + matched open versions) —
    the dimension itself is scanned once per batch and never shuffled
    (operators/merge.py::scd2_apply plan contract)."""

    warehouse: Warehouse
    checkpoint_root: str
    fmt: str = "parquet"

    def run(
        self,
        bronze_path: str,
        name: str,
        schema,
        keys: tuple[str, ...],
        compare_cols: tuple[str, ...],
        effective_col: str = "effective_date",
        timeout_sec: int = 120,
    ) -> None:
        stream = self.warehouse.spark.readStream.schema(schema).parquet(bronze_path)

        def apply_batch(batch_df, batch_id: int) -> None:
            self.warehouse.scd2_table(
                batch_df,
                "silver",
                name,
                keys=list(keys),
                compare_cols=list(compare_cols),
                effective_col=effective_col,
                fmt=self.fmt,
                dedup_order_by=[effective_col],
            )

        query = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint_root, name))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(timeout_sec)
