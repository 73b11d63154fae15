"""Spark-native MERGE semantics.

The reference merges via Iceberg SQL ``MERGE INTO … WHEN MATCHED THEN
UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` with an insert-only
variant for static dims (dags/2_bronze_to_silver.py:266-293; policy
dispatch at :266). This module implements the same relational
semantics as pure DataFrame algebra, so it works on any storage
(parquet dirs in tests, Delta/Iceberg when their jars are present —
the row-level-op fast path then lives in storage.py).

Composite keys are supported, mirroring the reference's
``" AND ".join(...)`` merge condition (dags/2_bronze_to_silver.py:268).

Scale notes (100 TB):
- The anti-join shuffles on the key columns; with a small staging
  batch (the normal incremental case) Catalyst/AQE turns it into a
  broadcast anti-join, so the big target is scanned once and never
  shuffled. This is exactly the copy-on-write cost profile of a
  format-native MERGE without file-level pruning; Delta/Iceberg
  integration (storage.py) recovers the pruning when available.
- ``keep_latest`` is one shuffle on the key; at scale prefer
  pre-partitioned/bucketed staging so it coalesces with the merge
  shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POLICIES = ("upsert", "insert_only")


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Deterministic replacement for the reference's staging dedup
    ``dropDuplicates(key_cols)`` (dags/2_bronze_to_silver.py:219, A10):
    keep exactly one row per key — the one with the greatest
    ``order_by`` tuple (later columns break ties; rows with NULL order
    values lose to non-NULL ones).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc_nulls_last() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge(
    target: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    policy: str = "upsert",
    dedup_order_by: Sequence[str] | None = None,
) -> DataFrame:
    """MERGE ``staging`` into ``target`` on ``keys``.

    - ``upsert``: WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *
      (K4) — staging rows win on key collision.
    - ``insert_only``: WHEN NOT MATCHED INSERT * (K5) — existing target
      rows are never touched.

    ``dedup_order_by``: if given, staging is first reduced to one row
    per key via :func:`keep_latest` (a MERGE precondition — multiple
    staging rows per key is an error in real MERGE).
    Columns are aligned by name (``UPDATE SET *`` contract): staging
    must contain every target column.
    """
    if policy not in POLICIES:
        raise ValueError(f"policy must be one of {POLICIES}, got {policy!r}")
    missing = [c for c in target.columns if c not in staging.columns]
    if missing:
        raise ValueError(f"staging is missing target columns: {missing}")
    keys = list(keys)
    if dedup_order_by:
        staging = keep_latest(staging, keys, dedup_order_by)
    staging = staging.select(*target.columns)
    if policy == "upsert":
        kept_target = target.join(staging.select(*keys), on=keys, how="left_anti")
        return kept_target.unionByName(staging)
    new_rows = staging.join(target.select(*keys), on=keys, how="left_anti")
    return target.unionByName(new_rows)
