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


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
    dedup_order_by: Sequence[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 batch apply — the classic
    lakehouse dimension-history merge (Kimball SCD2; the pattern the
    reference's Iceberg MERGE would be composed into for versioned
    dims).

    ``history`` holds the full version history: ``keys`` +
    ``compare_cols`` + (``valid_from``, ``valid_to``, ``current_col``)
    — open versions have NULL ``valid_to`` and ``current_col`` true.
    ``updates`` carries ``keys`` + ``compare_cols`` +
    ``effective_col``. Per update row:

    - key unknown → insert a new open version (valid_from=effective);
    - key known, any compare col differs (NULL-safe ``<=>``) → close
      the open version (valid_to=effective, current=false) and insert
      a new open version;
    - attributes identical → no-op (re-applying a batch is idempotent).

    Effective timestamps are assumed monotone per key (late-arriving
    updates are an upstream ordering problem, as in any MERGE-based
    SCD2); with multiple rows per key in one batch pass
    ``dedup_order_by`` to keep only the latest.

    Scale shape (100 TB dim, small batch): the update batch is
    semi-joined against open versions through a BROADCAST of the batch
    keys, so change detection happens on batch-sized frames; closing
    rows is a broadcast join of batch keys against the history scan.
    The history table is scanned once and never shuffled — the
    copy-on-write cost profile of a format-native MERGE
    (storage.py recovers file-level pruning when a format runtime is
    present).
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    expected = set(keys + compare_cols + [valid_from, valid_to, current_col])
    missing = expected - set(history.columns)
    if missing:
        raise ValueError(f"history is missing columns: {sorted(missing)}")
    missing_u = set(keys + compare_cols + [effective_col]) - set(updates.columns)
    if missing_u:
        raise ValueError(f"updates is missing columns: {sorted(missing_u)}")
    if dedup_order_by:
        updates = keep_latest(updates, keys, dedup_order_by)

    dtypes = dict(history.dtypes)
    to_type, from_type = dtypes[valid_to], dtypes[valid_from]
    hist_cols = history.columns
    cur = history.where(F.col(current_col))
    past = history.where(~F.col(current_col))

    u = updates.select(*keys, *compare_cols, F.col(effective_col).alias("__eff"))
    # batch-sized slice of the open versions: only keys present in the
    # batch can change, so the change-detection join never touches the
    # rest of the dimension
    cur_hit = cur.join(F.broadcast(u.select(*keys).distinct()), keys, "left_semi")
    c = cur_hit.select(
        *keys,
        *[F.col(a).alias(f"__c_{a}") for a in compare_cols],
        F.lit(True).alias("__exists"),
    )
    j = u.join(c, keys, "left")
    differs = F.lit(False)
    for a in compare_cols:
        differs = differs | ~F.col(a).eqNullSafe(F.col(f"__c_{a}"))
    needs_version = j.where(F.col("__exists").isNull() | differs)

    new_versions = needs_version.select(
        *keys, *compare_cols,
        F.col("__eff").cast(from_type).alias(valid_from),
        F.lit(None).cast(to_type).alias(valid_to),
        F.lit(True).alias(current_col),
    ).select(*hist_cols)

    to_close = needs_version.where(F.col("__exists")).select(
        *keys, F.col("__eff").alias("__close_eff")
    )
    closed = (
        cur.join(F.broadcast(to_close), keys)
        .withColumn(valid_to, F.col("__close_eff").cast(to_type))
        .withColumn(current_col, F.lit(False))
        .select(*hist_cols)
    )
    untouched_cur = cur.join(
        F.broadcast(to_close.select(*keys)), keys, "left_anti"
    ).select(*hist_cols)

    return (
        past.select(*hist_cols)
        .unionByName(untouched_cur)
        .unionByName(closed)
        .unionByName(new_versions)
    )
