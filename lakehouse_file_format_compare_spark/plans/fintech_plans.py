"""Reference-exact fintech gold queries as a driver-checkable entry.

These run the reference's ACTUAL pipeline semantics (seeded
generator → the four gold queries of dags/3_silver_to_gold.py with
their original schemas/filters) in-memory — no warehouse I/O — so the
driver's correctness gate records them (one suite entry: per-query
row counts + value checksums). They are not expressible as SQL over
the TPC-H testdata views (they use the generated fintech star
schema), so the suite is declared without an oracle → rows-only
check; per-value semantics are instead DuckDB-verified in
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


def gold_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four reference gold queries (dags/3_silver_to_gold.py) as
    one driver entry: per-query row count + order-independent value
    checksum (xxhash64 over every column, summed as decimal so ANSI
    mode can't overflow). Deterministic end-to-end (seeded generator,
    frozen clock), so the row is stable across runs — a value-sensitive
    rows-only check. Per-value fidelity vs DuckDB over the same
    generated data is asserted in tests/test_fintech_oracle.py."""
    from pyspark.sql import functions as F

    f = _frames(spark)
    parts = []
    for name, df in (
        ("q1_monthly_balance", gold.monthly_balance(f["f_transactions"], f["d_transaction_types"])),
        ("q2_customer_summary", gold.customer_summary(
            f["d_customers"], f["f_contracts"], f["d_products"],
            f["f_transactions"], f["d_transaction_types"],
        )),
        ("q3_daily_transaction_metrics",
         gold.daily_transaction_metrics(f["f_transactions"], f["d_transaction_types"])),
        ("q4_product_ranking", gold.product_ranking(
            f["f_transactions"], f["d_transaction_types"], f["f_contracts"], f["d_products"]
        )),
    ):
        checksum = F.xxhash64(*[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in df.columns
        ])
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum(checksum.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")).alias("checksum"),
            ).select(F.lit(name).alias("query"), "n_rows", "checksum")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES = {
    "fintech_gold_suite": gold_suite,
}

ORACLES: dict[str, str] = {}
