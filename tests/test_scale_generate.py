"""Scale-pattern smoke: synthetic fact generation with pure column
expressions over spark.range (NO driver-side row building, no
collect) at 10M rows, plus the gold-shaped aggregation over it.
This is the pattern a 100 TB synthetic load uses — the driver-side
generator in pipeline/generate.py is only for reference-scale bronze
batches (its docstring points here)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def synthetic_transactions(spark, n_rows: int):
    """Deterministic fact table derived entirely from the row id —
    distributes across however many executors exist."""
    df = spark.range(n_rows)
    h = F.xxhash64("id")
    return df.select(
        F.col("id").alias("transaction_id"),
        F.pmod(h, F.lit(100_000)).alias("contract_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(15)).alias("type_idx"),
        (F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60 * 86400))).alias(
            "completed_epoch"
        ),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)) / 100.0
         * F.when(F.pmod(F.xxhash64("id", F.lit(4)), 2) == 0, -1).otherwise(1)).alias("amount"),
    )


def test_scale_generation_and_aggregation(spark):
    n = 10_000_000
    txn = synthetic_transactions(spark, n)
    t0 = time.perf_counter()
    out = (
        txn.withColumn("ts", F.timestamp_seconds("completed_epoch"))
        .groupBy(F.year("ts").alias("ano"), F.month("ts").alias("mes"), "contract_id")
        .agg(
            F.sum(F.when(F.col("amount") > 0, F.col("amount")).otherwise(0.0)).alias("entradas"),
            F.sum(F.when(F.col("amount") < 0, -F.col("amount")).otherwise(0.0)).alias("saidas"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    groups = out.count()
    elapsed = time.perf_counter() - t0
    assert groups == 200_000  # 100k contracts x 2 months (60-day window)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == n
    # generation + shuffle + agg of 10M rows must be seconds, not minutes
    assert elapsed < 120, f"scale smoke too slow: {elapsed:.1f}s"


def test_scale_generation_is_deterministic(spark):
    a = synthetic_transactions(spark, 1000).collect()
    b = synthetic_transactions(spark, 1000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
