"""Reference-exact fintech gold queries as driver-checkable entries.

These run the reference's ACTUAL pipeline semantics (seeded
generator → the four gold queries of dags/3_silver_to_gold.py with
their original schemas/filters) in-memory — no warehouse I/O — so the
driver's correctness gate records them. They are not expressible as
SQL over the TPC-H testdata views (they use the generated fintech
star schema), so they are declared without oracles → rows-only
checks; their semantics are instead DuckDB-verified in
tests/test_fintech_oracle.py over the same generated data.

Determinism: fixed seed + frozen clock (pipeline/generate.py), no
created_at columns, sorted collect_set, tie-broken rankings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import gold
from ..pipeline.generate import GeneratorState, batch_to_dataframes, generate_batch

_BATCHES = 2
_SIZES = dict(n_customers=100, n_contracts=150, n_transactions=800, n_attributes=200)


def _frames(spark: SparkSession) -> dict[str, DataFrame]:
    state = GeneratorState(seed=42)
    merged: dict[str, DataFrame] = {}
    for _ in range(_BATCHES):
        batch = batch_to_dataframes(spark, generate_batch(state, **_SIZES))
        for name, df in batch.items():
            merged[name] = df if name not in merged else merged[name].unionByName(df)
    # facts have unique PKs across batches; static dims dedup by PK
    # (insert-only analog), mutable dims keep latest — replicate the
    # silver outcome relationally
    from ..operators.merge import keep_latest
    from ..schemas import FINTECH_TABLE_CONFIGS

    out = {}
    for name, df in merged.items():
        cfg = FINTECH_TABLE_CONFIGS[name]
        order = ["ingestion_timestamp"] if cfg.merge_policy == "upsert" else []
        if cfg.is_static_dim:
            # first version wins: keep EARLIEST ingestion
            from pyspark.sql import functions as F

            df = keep_latest(
                df.withColumn("__neg", -F.col("ingestion_timestamp").cast("double")),
                list(cfg.key_columns),
                ["__neg"],
            ).drop("__neg")
        else:
            df = keep_latest(df, list(cfg.key_columns),
                             ["ingestion_timestamp"] + list(cfg.key_columns))
        out[name] = df
    return out


def q1_monthly_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _frames(spark)
    return gold.monthly_balance(f["f_transactions"], f["d_transaction_types"])


def q2_customer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _frames(spark)
    return gold.customer_summary(
        f["d_customers"], f["f_contracts"], f["d_products"],
        f["f_transactions"], f["d_transaction_types"],
    )


def q3_daily_transaction_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _frames(spark)
    return gold.daily_transaction_metrics(f["f_transactions"], f["d_transaction_types"])


def q4_product_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _frames(spark)
    return gold.product_ranking(
        f["f_transactions"], f["d_transaction_types"], f["f_contracts"], f["d_products"]
    )


QUERIES = {
    "fintech_q1_monthly_balance": q1_monthly_balance,
    "fintech_q2_customer_summary": q2_customer_summary,
    "fintech_q3_daily_transaction_metrics": q3_daily_transaction_metrics,
    "fintech_q4_product_ranking": q4_product_ranking,
}

ORACLES: dict[str, str] = {}
