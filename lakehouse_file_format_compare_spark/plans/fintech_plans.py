"""Reference-exact fintech gold queries as a driver-checkable entry
with a FULL DuckDB oracle (r4 verdict item #2 — this row was the lone
`no_oracle` through r2-r4).

The four gold queries (pipeline/gold.py <- dags/3_silver_to_gold.py
:162-402) run over committed parquet fixtures
(fixtures/fintech_silver/, materialized from the seeded deterministic
generator by scripts/build_fintech_fixtures.py; equality with a fresh
generator run is asserted in tests/test_fintech_fixture.py). The
DuckDB oracle replicates the same four queries via read_parquet on the
SAME files, so both engines compute the gold semantics independently
from identical rows.

The suite row per query carries engine-portable evidence:
- n_rows — exact;
- sum_money — money aggregates snapped per group to the 2-decimal
  grid (functions/numeric.grid: pure IEEE floor math, bit-identical
  across engines; group sums of the generator's 2-decimal amounts sit
  ~1e-12 from grid points, never near a boundary), then summed and
  re-snapped — invariant to summation order;
- sum_counts — every COUNT/COUNT(DISTINCT) column, exact;
- int_fp — a per-row integer fingerprint over group keys, string
  lengths, ranks, dates and epoch timestamps (ids reduced mod 1000003
  to keep sums < 2^53), exact.
AVG/STDDEV-derived columns (valor_medio*, desvio_padrao,
ticket_medio) are division results of unrounded doubles — not
order-invariant across engines — and stay covered by the
tolerance-based per-value oracle in tests/test_fintech_oracle.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..pipeline import gold
from ..pipeline.generate import GeneratorState, batch_to_dataframes, generate_batch

_BATCHES = 2
_SIZES = dict(n_customers=100, n_contracts=150, n_transactions=800, n_attributes=200)

FIXTURE_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures", "fintech_silver")
)
GOLD_INPUT_TABLES = (
    "f_transactions", "d_transaction_types", "d_customers", "f_contracts", "d_products",
)
_MOD = 1_000_003


def _frames(spark: SparkSession) -> dict[str, DataFrame]:
    """The silver outcome of two seeded generator batches, computed
    relationally (facts keep unique PKs, static dims keep the earliest
    version, mutable dims keep the latest — the silver merge policy of
    dags/2_bronze_to_silver.py:70-161). Source of the committed
    fixture; kept for the determinism test and the per-value pytest
    oracle."""
    merged: dict[str, DataFrame] = {}
    state = GeneratorState(seed=42)
    for _ in range(_BATCHES):
        batch = batch_to_dataframes(spark, generate_batch(state, **_SIZES))
        for name, df in batch.items():
            merged[name] = df if name not in merged else merged[name].unionByName(df)
    from ..operators.merge import keep_latest
    from ..schemas import FINTECH_TABLE_CONFIGS

    out = {}
    for name, df in merged.items():
        cfg = FINTECH_TABLE_CONFIGS[name]
        if cfg.is_static_dim:
            # first version wins: keep EARLIEST ingestion
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


def _fixture_frames(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(FIXTURE_ROOT, name))
        for name in GOLD_INPUT_TABLES
    }


def q1_monthly_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fixture_frames(spark)
    return gold.monthly_balance(f["f_transactions"], f["d_transaction_types"])


def q2_customer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fixture_frames(spark)
    return gold.customer_summary(
        f["d_customers"], f["f_contracts"], f["d_products"],
        f["f_transactions"], f["d_transaction_types"],
    )


def q3_daily_transaction_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fixture_frames(spark)
    return gold.daily_transaction_metrics(f["f_transactions"], f["d_transaction_types"])


def q4_product_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fixture_frames(spark)
    return gold.product_ranking(
        f["f_transactions"], f["d_transaction_types"], f["f_contracts"], f["d_products"]
    )


# SCD2 row (r7): the customer dim as a Type-2 history — %4==0 rows
# change (last_name suffix), %4==1 re-arrive unchanged (must no-op),
# %10==0 also arrive as brand-new keys. Closed/open interval
# arithmetic and the idempotent no-op branch are all fingerprinted.
SCD2_D0 = "2025-01-01"
SCD2_D1 = "2025-06-01"
SCD2_UPD_MOD = 4
SCD2_NEW_MOD = 10
SCD2_NEW_OFFSET = 1_000_000


def _scd2_result(cust: DataFrame) -> DataFrame:
    from ..operators.merge import scd2_apply

    hist = cust.select(
        "customer_id", "first_name", "last_name",
        F.lit(SCD2_D0).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    eff = F.lit(SCD2_D1).cast("date").alias("effective_date")
    changed = cust.where(F.pmod("customer_id", F.lit(SCD2_UPD_MOD)) == 0).select(
        "customer_id", "first_name",
        F.concat(F.col("last_name"), F.lit("-II")).alias("last_name"), eff,
    )
    unchanged = cust.where(F.pmod("customer_id", F.lit(SCD2_UPD_MOD)) == 1).select(
        "customer_id", "first_name", "last_name", eff
    )
    new = cust.where(F.pmod("customer_id", F.lit(SCD2_NEW_MOD)) == 0).select(
        (F.col("customer_id") + SCD2_NEW_OFFSET).alias("customer_id"),
        F.concat(F.lit("new-"), F.col("first_name")).alias("first_name"),
        "last_name", eff,
    )
    return scd2_apply(
        hist, changed.unionByName(unchanged).unionByName(new),
        keys=["customer_id"], compare_cols=["first_name", "last_name"],
    )


# change-feed row (r7): diff d_customers against a derived second
# snapshot — %13 keys deleted, %7 survivors' last_name suffixed
# (update pre+post images), %11 keys re-inserted under a new id.
CDF_DEL_MOD = 13
CDF_UPD_MOD = 7
CDF_NEW_MOD = 11
CDF_NEW_OFFSET = 2_000_000


def _change_feed_result(cust: DataFrame) -> DataFrame:
    from ..storage import snapshot_diff

    v1 = cust.select("customer_id", "first_name", "last_name")
    kept = v1.where(F.pmod("customer_id", F.lit(CDF_DEL_MOD)) != 0)
    v2 = kept.select(
        "customer_id",
        "first_name",
        F.when(
            F.pmod("customer_id", F.lit(CDF_UPD_MOD)) == 0,
            F.concat(F.col("last_name"), F.lit("-X")),
        ).otherwise(F.col("last_name")).alias("last_name"),
    ).unionByName(
        v1.where(F.pmod("customer_id", F.lit(CDF_NEW_MOD)) == 0).select(
            (F.col("customer_id") + CDF_NEW_OFFSET).alias("customer_id"),
            F.concat(F.lit("cf-"), F.col("first_name")).alias("first_name"),
            "last_name",
        )
    )
    return snapshot_diff(v1, v2, keys=["customer_id"])


def _summarize(name: str, df: DataFrame, money, counts, fp) -> DataFrame:
    """One suite row: portable aggregates of a gold result (see module
    docstring for why each column is engine-exact)."""
    staged = df.select(
        money.alias("__m"), counts.cast("long").alias("__c"), fp.cast("long").alias("__fp")
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        grid(F.coalesce(F.sum("__m"), F.lit(0.0)), 2).alias("sum_money"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("sum_counts"),
        F.coalesce(F.sum("__fp"), F.lit(0)).alias("int_fp"),
    ).select(F.lit(name).alias("query"), "n_rows", "sum_money", "sum_counts", "int_fp")


def _reference_gold_rows(f: dict[str, DataFrame]) -> list[DataFrame]:
    """Suite rows q1-q4 — the reference's ACTUAL gold stage
    (dags/3_silver_to_gold.py:162-402). Shared by gold_suite (the
    driver contract row, which adds the q5/q6 extension surfaces) and
    gold_serving (the bench entry that keeps the reference-parity
    signal comparable round-over-round, r7 verdict #6)."""
    epoch0 = F.lit("1970-01-01")

    q1 = gold.monthly_balance(f["f_transactions"], f["d_transaction_types"])
    s1 = _summarize(
        "q1_monthly_balance", q1,
        money=sum(grid(F.col(c), 2) for c in
                  ("entradas", "saidas", "saldo_liquido", "maior_entrada", "maior_saida")),
        counts=F.col("total_transacoes"),
        fp=F.col("ano") * 10000 + F.col("mes") * 100 + F.pmod(F.col("contract_id"), F.lit(_MOD)),
    )

    q2 = gold.customer_summary(
        f["d_customers"], f["f_contracts"], f["d_products"],
        f["f_transactions"], f["d_transaction_types"],
    )
    s2 = _summarize(
        "q2_customer_summary", q2,
        money=grid(F.col("saldo_total"), 2),
        counts=F.col("total_contratos") + F.col("categorias_produtos") + F.col("total_transacoes"),
        fp=F.pmod(F.col("customer_id"), F.lit(_MOD))
        + F.length("first_name") * 1009
        + F.length("last_name") * 31
        + F.length(F.concat_ws(",", F.col("produtos_utilizados"))) * 7
        + F.coalesce(F.unix_timestamp("ultima_atividade"), F.lit(0)),
    )

    q3 = gold.daily_transaction_metrics(f["f_transactions"], f["d_transaction_types"])
    s3 = _summarize(
        "q3_daily_transaction_metrics", q3,
        money=sum(grid(F.col(c), 2) for c in ("volume_total", "valor_minimo", "valor_maximo")),
        counts=F.col("quantidade_transacoes") + F.col("contratos_unicos"),
        fp=F.datediff(F.col("data_transacao"), epoch0) * 1009
        + F.length("transaction_type_name"),
    )

    q4 = gold.product_ranking(
        f["f_transactions"], f["d_transaction_types"], f["f_contracts"], f["d_products"]
    )
    s4 = _summarize(
        "q4_product_ranking", q4,
        money=grid(F.col("volume_financeiro"), 2),
        counts=F.col("total_transacoes") + F.col("contratos_ativos") + F.col("clientes_unicos"),
        fp=F.col("rank_volume") * 1009
        + F.col("rank_transacoes") * 31
        + F.length("product_name")
        + F.length("product_category") * 7,
    )
    return [s1, s2, s3, s4]


def gold_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only entry: q1-q4 (the reference's gold stage) WITHOUT
    the q5 SCD2 / q6 change-feed extension rows, so the parity signal
    in BENCH_r{N} stays comparable round-over-round as extension
    coverage grows (r7 verdict #6)."""
    rows = _reference_gold_rows(_fixture_frames(spark))
    out = rows[0]
    for p in rows[1:]:
        out = out.unionByName(p)
    return out


def gold_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four reference gold queries (plus the q5 SCD2 and q6
    change-feed extension rows) as one driver entry, fully
    DuckDB-oracled (FINTECH_GOLD_SUITE_SQL replays the same queries on
    the same fixture files)."""
    f = _fixture_frames(spark)
    epoch0 = F.lit("1970-01-01")
    s1, s2, s3, s4 = _reference_gold_rows(f)

    s5 = _summarize(
        "q5_scd2_customer_history", _scd2_result(f["d_customers"]),
        money=grid(
            F.coalesce(F.datediff("valid_to", "valid_from"), F.lit(0)) / F.lit(100.0), 2
        ),
        counts=F.col("is_current").cast("long"),
        fp=F.pmod(F.col("customer_id"), F.lit(_MOD))
        + F.length("first_name") * 31
        + F.length("last_name") * 7
        + F.datediff(F.col("valid_from"), epoch0) * 1009
        + F.coalesce(F.datediff(F.col("valid_to"), epoch0), F.lit(0)) * 13,
    )

    code = (
        F.when(F.col("_change_type") == "insert", 1)
        .when(F.col("_change_type") == "delete", 2)
        .when(F.col("_change_type") == "update_preimage", 3)
        .otherwise(4)
    )
    s6 = _summarize(
        "q6_change_feed", _change_feed_result(f["d_customers"]),
        money=grid(F.length("last_name") / F.lit(100.0), 2),
        counts=code,
        fp=code * 1009
        + F.pmod(F.col("customer_id"), F.lit(_MOD))
        + F.length("first_name") * 31
        + F.length("last_name") * 7,
    )

    out = s1
    for p in (s2, s3, s4, s5, s6):
        out = out.unionByName(p)
    return out


def _fx(table: str) -> str:
    return f"read_parquet('{os.path.join(FIXTURE_ROOT, table)}/*.parquet')"


def _g(expr: str) -> str:
    return grid_sql(expr, 2)


# DuckDB replication of the four gold queries (translations proven
# per-value in tests/test_fintech_oracle.py) + the same summaries.
FINTECH_GOLD_SUITE_SQL = f"""
WITH fin AS (
    SELECT t.*, tt.transaction_type_name, tt.is_financial
    FROM {_fx('f_transactions')} t
    JOIN {_fx('d_transaction_types')} tt USING (transaction_type_id)
    WHERE tt.is_financial = true AND to_timestamp(t.completed_at_time_id) IS NOT NULL
), q1 AS (
    SELECT year(to_timestamp(completed_at_time_id)) AS ano,
           month(to_timestamp(completed_at_time_id)) AS mes,
           contract_id,
           SUM(CASE WHEN amount > 0 THEN amount ELSE 0 END) AS entradas,
           SUM(CASE WHEN amount < 0 THEN ABS(amount) ELSE 0 END) AS saidas,
           SUM(amount) AS saldo_liquido,
           COUNT(*) AS total_transacoes,
           MAX(amount) AS maior_entrada,
           MIN(amount) AS maior_saida
    FROM fin GROUP BY 1, 2, 3
), contract_fin AS (
    SELECT contract_id,
           SUM(amount) AS saldo_contrato,
           COUNT(*) AS txns_contrato,
           MAX(make_timestamp(completed_at_time_id * 1000000)) AS ultima_atividade_contrato
    FROM fin GROUP BY 1
), q2 AS (
    SELECT cu.customer_id, cu.first_name, cu.last_name,
           COUNT(DISTINCT c.contract_id) AS total_contratos,
           COUNT(DISTINCT p.product_category) AS categorias_produtos,
           SUM(COALESCE(fs.saldo_contrato, 0)) AS saldo_total,
           SUM(COALESCE(fs.txns_contrato, 0)) AS total_transacoes,
           MAX(fs.ultima_atividade_contrato) AS ultima_atividade,
           COALESCE(list_sort(list_distinct(list(p.product_category)
               FILTER (p.product_category IS NOT NULL))), []) AS produtos_utilizados
    FROM {_fx('d_customers')} cu
    LEFT JOIN {_fx('f_contracts')} c USING (customer_id)
    LEFT JOIN {_fx('d_products')} p USING (product_id)
    LEFT JOIN contract_fin fs ON c.contract_id = fs.contract_id
    GROUP BY 1, 2, 3
), q3 AS (
    SELECT CAST(to_timestamp(completed_at_time_id) AS DATE) AS data_transacao,
           transaction_type_name,
           COUNT(*) AS quantidade_transacoes,
           SUM(amount) AS volume_total,
           MIN(amount) AS valor_minimo,
           MAX(amount) AS valor_maximo,
           COUNT(DISTINCT contract_id) AS contratos_unicos
    FROM fin GROUP BY 1, 2
), q4m AS (
    SELECT p.product_name, p.product_category,
           COUNT(*) AS total_transacoes,
           SUM(t.amount) AS volume_financeiro,
           COUNT(DISTINCT c.contract_id) AS contratos_ativos,
           COUNT(DISTINCT c.customer_id) AS clientes_unicos
    FROM fin t
    JOIN {_fx('f_contracts')} c USING (contract_id)
    JOIN {_fx('d_products')} p USING (product_id)
    GROUP BY 1, 2
), q4 AS (
    SELECT *,
           ROW_NUMBER() OVER (ORDER BY volume_financeiro DESC, product_name) AS rank_volume,
           ROW_NUMBER() OVER (ORDER BY total_transacoes DESC, product_name) AS rank_transacoes
    FROM q4m
), scd2_hist AS (
    SELECT customer_id, first_name, last_name,
           DATE '{SCD2_D0}' AS valid_from, CAST(NULL AS DATE) AS valid_to,
           true AS is_current
    FROM {_fx('d_customers')}
), scd2_upd AS (
    SELECT customer_id, first_name, last_name || '-II' AS last_name,
           DATE '{SCD2_D1}' AS eff
    FROM {_fx('d_customers')} WHERE customer_id % {SCD2_UPD_MOD} = 0
    UNION ALL
    SELECT customer_id, first_name, last_name, DATE '{SCD2_D1}'
    FROM {_fx('d_customers')} WHERE customer_id % {SCD2_UPD_MOD} = 1
    UNION ALL
    SELECT customer_id + {SCD2_NEW_OFFSET}, 'new-' || first_name, last_name,
           DATE '{SCD2_D1}'
    FROM {_fx('d_customers')} WHERE customer_id % {SCD2_NEW_MOD} = 0
), scd2_joined AS (
    SELECT u.customer_id, u.first_name, u.last_name, u.eff,
           c.customer_id IS NOT NULL AS key_exists,
           (u.first_name IS DISTINCT FROM c.first_name
            OR u.last_name IS DISTINCT FROM c.last_name) AS attrs_differ
    FROM scd2_upd u LEFT JOIN scd2_hist c USING (customer_id)
), scd2_needs AS (
    SELECT * FROM scd2_joined WHERE NOT key_exists OR attrs_differ
), scd2_result AS (
    SELECT c.customer_id, c.first_name, c.last_name, c.valid_from,
           n.eff AS valid_to, false AS is_current
    FROM scd2_hist c JOIN scd2_needs n USING (customer_id)
    UNION ALL
    SELECT * FROM scd2_hist
    WHERE customer_id NOT IN (SELECT customer_id FROM scd2_needs WHERE key_exists)
    UNION ALL
    SELECT customer_id, first_name, last_name, eff, CAST(NULL AS DATE), true
    FROM scd2_needs
), cf_v1 AS (
    SELECT customer_id, first_name, last_name FROM {_fx('d_customers')}
), cf_v2 AS (
    SELECT customer_id, first_name,
           CASE WHEN customer_id % {CDF_UPD_MOD} = 0 THEN last_name || '-X'
                ELSE last_name END AS last_name
    FROM cf_v1 WHERE customer_id % {CDF_DEL_MOD} != 0
    UNION ALL
    SELECT customer_id + {CDF_NEW_OFFSET}, 'cf-' || first_name, last_name
    FROM cf_v1 WHERE customer_id % {CDF_NEW_MOD} = 0
), cf_j AS (
    SELECT COALESCE(a.customer_id, b.customer_id) AS customer_id,
           a.first_name AS o_fn, a.last_name AS o_ln,
           b.first_name AS n_fn, b.last_name AS n_ln,
           a.customer_id IS NOT NULL AS o_p,
           b.customer_id IS NOT NULL AS n_p
    FROM cf_v1 a FULL OUTER JOIN cf_v2 b ON a.customer_id = b.customer_id
), cf_rows AS (
    SELECT customer_id, n_fn AS first_name, n_ln AS last_name, 1 AS code
    FROM cf_j WHERE n_p AND NOT o_p
    UNION ALL
    SELECT customer_id, o_fn, o_ln, 2 FROM cf_j WHERE o_p AND NOT n_p
    UNION ALL
    SELECT customer_id, o_fn, o_ln, 3 FROM cf_j
    WHERE o_p AND n_p AND (o_fn IS DISTINCT FROM n_fn OR o_ln IS DISTINCT FROM n_ln)
    UNION ALL
    SELECT customer_id, n_fn, n_ln, 4 FROM cf_j
    WHERE o_p AND n_p AND (o_fn IS DISTINCT FROM n_fn OR o_ln IS DISTINCT FROM n_ln)
)
SELECT 'q1_monthly_balance' AS query,
       COUNT(*) AS n_rows,
       {_g("COALESCE(SUM(" + " + ".join(_g(c) for c in ("entradas", "saidas", "saldo_liquido", "maior_entrada", "maior_saida")) + "), 0)")} AS sum_money,
       CAST(COALESCE(SUM(total_transacoes), 0) AS BIGINT) AS sum_counts,
       CAST(COALESCE(SUM(ano * 10000 + mes * 100 + contract_id % {_MOD}), 0) AS BIGINT) AS int_fp
FROM q1
UNION ALL
SELECT 'q2_customer_summary',
       COUNT(*),
       {_g("COALESCE(SUM(" + _g("saldo_total") + "), 0)")},
       CAST(COALESCE(SUM(total_contratos + categorias_produtos + total_transacoes), 0) AS BIGINT),
       CAST(COALESCE(SUM(customer_id % {_MOD}
            + length(first_name) * 1009 + length(last_name) * 31
            + COALESCE(length(array_to_string(produtos_utilizados, ',')), 0) * 7
            + COALESCE(CAST(epoch(ultima_atividade) AS BIGINT), 0)), 0) AS BIGINT)
FROM q2
UNION ALL
SELECT 'q3_daily_transaction_metrics',
       COUNT(*),
       {_g("COALESCE(SUM(" + " + ".join(_g(c) for c in ("volume_total", "valor_minimo", "valor_maximo")) + "), 0)")},
       CAST(COALESCE(SUM(quantidade_transacoes + contratos_unicos), 0) AS BIGINT),
       CAST(COALESCE(SUM((data_transacao - DATE '1970-01-01') * 1009
            + length(transaction_type_name)), 0) AS BIGINT)
FROM q3
UNION ALL
SELECT 'q4_product_ranking',
       COUNT(*),
       {_g("COALESCE(SUM(" + _g("volume_financeiro") + "), 0)")},
       CAST(COALESCE(SUM(total_transacoes + contratos_ativos + clientes_unicos), 0) AS BIGINT),
       CAST(COALESCE(SUM(rank_volume * 1009 + rank_transacoes * 31
            + length(product_name) + length(product_category) * 7), 0) AS BIGINT)
FROM q4
UNION ALL
SELECT 'q5_scd2_customer_history',
       COUNT(*),
       {_g("COALESCE(SUM(" + _g("COALESCE(valid_to - valid_from, 0) / 100.0") + "), 0)")},
       CAST(COALESCE(SUM(CASE WHEN is_current THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(customer_id % {_MOD}
            + length(first_name) * 31 + length(last_name) * 7
            + (valid_from - DATE '1970-01-01') * 1009
            + COALESCE(valid_to - DATE '1970-01-01', 0) * 13), 0) AS BIGINT)
FROM scd2_result
UNION ALL
SELECT 'q6_change_feed',
       COUNT(*),
       {_g("COALESCE(SUM(" + _g("length(last_name) / 100.0") + "), 0)")},
       CAST(COALESCE(SUM(code), 0) AS BIGINT),
       CAST(COALESCE(SUM(code * 1009 + customer_id % {_MOD}
            + length(first_name) * 31 + length(last_name) * 7), 0) AS BIGINT)
FROM cf_rows
"""


QUERIES = {
    "fintech_gold_suite": gold_suite,
}

ORACLES = {
    "fintech_gold_suite": FINTECH_GOLD_SUITE_SQL,
}
