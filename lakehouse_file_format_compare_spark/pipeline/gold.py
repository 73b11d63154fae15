"""Silver → Gold analytics with reference-identical semantics
(dags/3_silver_to_gold.py:106-437), as pure DataFrame functions over
the fintech silver tables.

Differences vs plans/gold.py: these run on the engine's OWN pipeline
output (generate → bronze → silver) with the reference's exact
columns, including the degraded no-financial-data variants
(3_…py:226-242, 350-365) behind ``has_financial=False`` (the caller
resolves the reference's COUNT gate, 3_…py:149-155). The
``created_at = CURRENT_TIMESTAMP`` audit column (3_…py:174 et al.) is
optional so tests can freeze it.

Three deliberate non-semantic deviations:
- COLLECT_SET results are sorted (set order is engine-undefined);
- ROW_NUMBER ranks are tie-broken on product_name (the reference's
  unqualified ORDER BY is nondeterministic across runs);
- degraded-variant zero columns keep the financial branch's types
  (DOUBLE 0.0 / BIGINT 0 for saldo_total, total_transacoes,
  volume_financeiro, ticket_medio) where the reference emits INT 0
  (3_…py:234-237, 354-358) — so a table's schema does not flip with
  data presence across refresh cycles.

Every query is Catalyst-optimized: dim joins broadcast, epoch→ts
casts stay in codegen, aggregations partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def _completed_ts():
    # epoch-sec FK → timestamp (3_…py:140: CAST(completed_at_time_id AS TIMESTAMP))
    return F.timestamp_seconds(F.col("completed_at_time_id"))


def financial_txns(f_transactions: DataFrame, d_transaction_types: DataFrame) -> DataFrame:
    """Shared base: txn ⋈ type (J1), financial + completed filter
    (3_…py:149-155). Public: the runner's existence probe and the
    incremental-gold state builders consume it too."""
    return (
        f_transactions.join(F.broadcast(d_transaction_types), "transaction_type_id")
        .where((F.col("is_financial") == True) & _completed_ts().isNotNull())  # noqa: E712
    )


# backwards-compatible alias (promoted to public per round-2 advice)
_financial_txns = financial_txns


def contract_financials(
    f_transactions: DataFrame, d_transaction_types: DataFrame
) -> DataFrame:
    """Q2's per-contract rollup CTE (3_…py:245-257), exposed as the
    contract-grain state the incremental path maintains O(batch):
    saldo/count fold by addition, last-activity by greatest."""
    return (
        financial_txns(f_transactions, d_transaction_types)
        .groupBy("contract_id")
        .agg(
            F.sum("amount").alias("saldo_contrato"),
            F.count(F.lit(1)).alias("txns_contrato"),
            F.max(_completed_ts()).alias("ultima_atividade_contrato"),
        )
    )


def customer_summary_from_contract_state(
    d_customers: DataFrame,
    f_contracts: DataFrame,
    d_products: DataFrame,
    contract_state: DataFrame,
    with_created_at: bool = False,
) -> DataFrame:
    """Q2 serving rollup from a maintained contract-grain state
    (3_…py:260-277): O(contracts + dims), never O(transactions). With
    an EMPTY state this reproduces the reference's degraded variant
    values (zeros / NULL timestamp) by construction of the
    left-join + COALESCE."""
    enriched = (
        d_customers.join(f_contracts, "customer_id", "left")
        .join(F.broadcast(d_products), "product_id", "left")
    )
    out = (
        enriched.join(contract_state, "contract_id", "left")
        .groupBy("customer_id", "first_name", "last_name")
        .agg(
            F.countDistinct("contract_id").alias("total_contratos"),
            F.countDistinct("product_category").alias("categorias_produtos"),
            F.sum(F.coalesce(F.col("saldo_contrato"), F.lit(0.0))).alias("saldo_total"),
            F.sum(F.coalesce(F.col("txns_contrato"), F.lit(0))).alias("total_transacoes"),
            F.max("ultima_atividade_contrato").alias("ultima_atividade"),
            F.sort_array(F.collect_set("product_category")).alias("produtos_utilizados"),
        )
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out


def monthly_balance(
    f_transactions: DataFrame,
    d_transaction_types: DataFrame,
    with_created_at: bool = False,
) -> DataFrame:
    """Q1 (3_…py:162-183): YEAR/MONTH of completed ts × contract_id,
    entradas/saidas via amount-sign CASE, ABS on the negative side.
    maior_entrada/maior_saida are MAX(amount)/MIN(amount) verbatim
    (3_…py:172-173) — NOT max-of-positives / max-of-abs-negatives, so
    an all-negative month has a negative maior_entrada, exactly as the
    reference produces."""
    base = _financial_txns(f_transactions, d_transaction_types)
    amt = F.col("amount")
    pos = F.when(amt > 0, amt).otherwise(F.lit(0.0))
    neg = F.when(amt < 0, F.abs(amt)).otherwise(F.lit(0.0))
    out = (
        base.groupBy(
            F.year(_completed_ts()).alias("ano"),
            F.month(_completed_ts()).alias("mes"),
            F.col("contract_id"),
        )
        .agg(
            F.sum(pos).alias("entradas"),
            F.sum(neg).alias("saidas"),
            F.sum(amt).alias("saldo_liquido"),
            F.count(F.lit(1)).alias("total_transacoes"),
            F.avg(amt).alias("valor_medio_transacao"),
            F.max(amt).alias("maior_entrada"),
            F.min(amt).alias("maior_saida"),
        )
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out


def customer_summary(
    d_customers: DataFrame,
    f_contracts: DataFrame,
    d_products: DataFrame,
    f_transactions: DataFrame | None = None,
    d_transaction_types: DataFrame | None = None,
    with_created_at: bool = False,
) -> DataFrame:
    """Q2 (3_…py:226-287): two-level rollup. With financial data: per-
    contract saldo/txn-count/last-activity first (3_…py:245-257), then
    per-customer with COLLECT_SET of product CATEGORIES + COALESCE
    (3_…py:260-277; produtos_utilizados is COLLECT_SET(product_category),
    3_…py:270 — not product_name). Without (degraded variant
    3_…py:226-242): contracts/products only, zeros and
    CAST(NULL AS TIMESTAMP). The set is sorted for determinism
    (COLLECT_SET order is undefined in both engines)."""
    enriched = (
        d_customers.join(f_contracts, "customer_id", "left")
        .join(F.broadcast(d_products), "product_id", "left")
    )
    if f_transactions is None:
        return (
            enriched.groupBy("customer_id", "first_name", "last_name")
            .agg(
                F.countDistinct("contract_id").alias("total_contratos"),
                F.countDistinct("product_category").alias("categorias_produtos"),
                F.lit(0.0).alias("saldo_total"),
                F.lit(0).cast("long").alias("total_transacoes"),
                F.lit(None).cast("timestamp").alias("ultima_atividade"),
                F.sort_array(F.collect_set("product_category")).alias("produtos_utilizados"),
            )
        )
    return customer_summary_from_contract_state(
        d_customers, f_contracts, d_products,
        contract_financials(f_transactions, d_transaction_types),
        with_created_at=with_created_at,
    )


def product_ranking_from_contract_state(
    contract_state: DataFrame,
    f_contracts: DataFrame,
    d_products: DataFrame,
    with_created_at: bool = False,
) -> DataFrame:
    """Q4 serving rollup from the SAME contract-grain state Q2
    maintains — no additional state needed, because every Q4 aggregate
    collapses onto contract grain first: total_transacoes/
    volume_financeiro are sums of the per-contract count/sum,
    ticket_medio is their ratio (AVG over all transaction rows),
    contratos_ativos is the per-product state row count (the state
    holds exactly the contracts with >=1 financial transaction — Q4's
    inner join semantics, 3_…py:368-384), and clientes_unicos counts
    the distinct customers of those contracts. O(contracts + dims) per
    cycle. Precondition (same as Q2): dims joined at serving time, so
    contract->product re-mapping is picked up automatically."""
    base = (
        contract_state.join(f_contracts, "contract_id")
        .join(F.broadcast(d_products), "product_id")
    )
    metrics = base.groupBy("product_name", "product_category").agg(
        F.sum("txns_contrato").alias("total_transacoes"),
        F.sum("saldo_contrato").alias("volume_financeiro"),
        F.countDistinct("contract_id").alias("contratos_ativos"),
        F.countDistinct("customer_id").alias("clientes_unicos"),
        (F.sum("saldo_contrato") / F.sum("txns_contrato")).alias("ticket_medio"),
    )
    w_vol = Window.orderBy(F.col("volume_financeiro").desc(), F.col("product_name"))
    w_txn = Window.orderBy(F.col("total_transacoes").desc(), F.col("product_name"))
    out = metrics.select(
        "*",
        F.row_number().over(w_vol).alias("rank_volume"),
        F.row_number().over(w_txn).alias("rank_transacoes"),
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out


def daily_transaction_metrics(
    f_transactions: DataFrame,
    d_transaction_types: DataFrame,
    with_created_at: bool = False,
) -> DataFrame:
    """Q3 (3_…py:303-324): DATE(completed) × type × is_financial, 8
    aggregates incl. sample stddev + distinct contracts. Filters to
    is_financial = true like Q1 (3_…py:318) — the is_financial group
    column is therefore constant true, but the reference keeps it in
    the schema, so we do too."""
    base = _financial_txns(f_transactions, d_transaction_types)
    out = (
        base.groupBy(
            F.to_date(_completed_ts()).alias("data_transacao"),
            F.col("transaction_type_name"),
            F.col("is_financial"),
        )
        .agg(
            F.count(F.lit(1)).alias("quantidade_transacoes"),
            F.sum("amount").alias("volume_total"),
            F.avg("amount").alias("valor_medio"),
            F.stddev("amount").alias("desvio_padrao"),
            F.min("amount").alias("valor_minimo"),
            F.max("amount").alias("valor_maximo"),
            F.countDistinct("contract_id").alias("contratos_unicos"),
        )
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out


def product_ranking(
    f_transactions: DataFrame,
    d_transaction_types: DataFrame,
    f_contracts: DataFrame,
    d_products: DataFrame,
    has_financial: bool = True,
    with_created_at: bool = False,
) -> DataFrame:
    """Q4 (3_…py:368-402): 4-way inner join CTE grouped by product,
    then two global ROW_NUMBER ranks (tie-broken on product_name for
    determinism — SURVEY §7.3). volume_financeiro/ticket_medio are
    SUM(amount)/AVG(amount) verbatim (3_…py:374,377) — signed, not
    ABS, so refund-heavy products rank LOW on volume, exactly as the
    reference ranks them. Degraded contracts-only variant
    (3_…py:350-365) selected by ``has_financial=False`` — the caller
    resolves the gate (the reference's COUNT probe, 3_…py:149-155, is
    the runner's job), keeping this builder action-free/lazy."""
    if has_financial:
        fin = _financial_txns(f_transactions, d_transaction_types)
        metrics = (
            fin.join(f_contracts, "contract_id")
            .join(F.broadcast(d_products), "product_id")
            .groupBy("product_name", "product_category")
            .agg(
                F.count(F.lit(1)).alias("total_transacoes"),
                F.sum(F.col("amount")).alias("volume_financeiro"),
                F.countDistinct("contract_id").alias("contratos_ativos"),
                F.countDistinct("customer_id").alias("clientes_unicos"),
                F.avg(F.col("amount")).alias("ticket_medio"),
            )
        )
    else:
        # degraded variant emits CONSTANT rank 1 for both ranks
        # (3_…py:359-360) — no window at all, matched verbatim
        metrics = (
            f_contracts.join(F.broadcast(d_products), "product_id")
            .groupBy("product_name", "product_category")
            .agg(
                F.lit(0).cast("long").alias("total_transacoes"),
                F.lit(0.0).alias("volume_financeiro"),
                F.countDistinct("contract_id").alias("contratos_ativos"),
                F.countDistinct("customer_id").alias("clientes_unicos"),
                F.lit(0.0).alias("ticket_medio"),
            )
        )
        out = metrics.select(
            "*", F.lit(1).alias("rank_volume"), F.lit(1).alias("rank_transacoes")
        )
        if with_created_at:
            out = out.withColumn("created_at", F.current_timestamp())
        return out
    w_vol = Window.orderBy(F.col("volume_financeiro").desc(), F.col("product_name"))
    w_txn = Window.orderBy(F.col("total_transacoes").desc(), F.col("product_name"))
    out = metrics.select(
        "*",
        F.row_number().over(w_vol).alias("rank_volume"),
        F.row_number().over(w_txn).alias("rank_transacoes"),
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out
