"""Gold analytics — the reference's four benchmark queries (SURVEY §2.6),
re-expressed over the driver's TPC-H-ish testdata schema.

Mapping of the fintech star schema onto testdata:
  f_transactions → lineitem / events     d_customers → customer
  f_contracts    → orders                d_products  → part
  d_transaction_types (dim filter) → supplier / event_type

Semantics preserved per query (citations → reference):
  Q1 monthly_balance           dags/3_silver_to_gold.py:162-195
  Q2 customer_summary          dags/3_silver_to_gold.py:226-287
  Q3 daily_transaction_metrics dags/3_silver_to_gold.py:303-335
  Q4 product_ranking           dags/3_silver_to_gold.py:368-402

Determinism deltas vs the reference (SURVEY §7.3): ROW_NUMBER gets
explicit tie-breakers; COLLECT_SET is sorted and joined to a string;
money values are snapped to the 2-decimal grid BEFORE summing
(functions/numeric.py) so aggregates are invariant to summation order
and bit-identical across engines; STDDEV is computed from snapped
moment sums for the same reason.

Scale notes (100 TB): every query is a single declarative plan —
Catalyst broadcasts the dims, aggregations are partial+final hash
aggs, and the only wide shuffles are on the groupBy keys, which are
high-cardinality and unskewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.numeric import grid, grid_sql
from ..sources.testdata import table

# transaction amount analog: extended price net of discount, snapped
# to the money grid so every downstream aggregate is order-invariant
_AMT_SQL = grid_sql("l_extendedprice * (1 - l_discount)", 2)


def _amt():
    return grid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)


def monthly_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: inner join fact⋈dim with dim-attribute filter, NOT NULL
    guard, conditional SUM / ABS split, group by (year, month, key),
    7 aggregates. Mirrors dags/3_silver_to_gold.py:162-183 with
    lineitem as f_transactions, supplier as the filtering dim
    (is_financial → s_acctbal > 0), returnflag 'R' as the outflow side.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    amt = _amt()
    inflow = F.col("l_returnflag") != "R"
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .where((F.col("s_acctbal") > 0) & F.col("l_shipdate").isNotNull())
        .groupBy(
            F.year("l_shipdate").alias("ano"),
            F.month("l_shipdate").alias("mes"),
            F.col("l_suppkey").alias("contract_id"),
        )
        .agg(
            grid(F.sum(F.when(inflow, amt).otherwise(F.lit(0.0))), 2).alias("entradas"),
            grid(F.sum(F.when(~inflow, F.abs(amt)).otherwise(F.lit(0.0))), 2).alias("saidas"),
            grid(F.sum(F.when(inflow, amt).otherwise(-amt)), 2).alias("saldo_liquido"),
            F.count(F.lit(1)).alias("total_transacoes"),
            grid(grid(F.sum(amt), 2) / F.count(F.lit(1)), 4).alias("valor_medio_transacao"),
            F.max(amt).alias("maior_transacao"),
            F.min(amt).alias("menor_transacao"),
        )
    )


MONTHLY_BALANCE_SQL = f"""
SELECT year(l_shipdate) AS ano,
       month(l_shipdate) AS mes,
       l_suppkey AS contract_id,
       {grid_sql(f"SUM(CASE WHEN l_returnflag <> 'R' THEN {_AMT_SQL} ELSE 0 END)", 2)} AS entradas,
       {grid_sql(f"SUM(CASE WHEN l_returnflag = 'R' THEN ABS({_AMT_SQL}) ELSE 0 END)", 2)} AS saidas,
       {grid_sql(f"SUM(CASE WHEN l_returnflag <> 'R' THEN {_AMT_SQL} ELSE -({_AMT_SQL}) END)", 2)} AS saldo_liquido,
       COUNT(*) AS total_transacoes,
       {grid_sql(grid_sql(f"SUM({_AMT_SQL})", 2) + " / COUNT(*)", 4)} AS valor_medio_transacao,
       MAX({_AMT_SQL}) AS maior_transacao,
       MIN({_AMT_SQL}) AS menor_transacao
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_acctbal > 0 AND l_shipdate IS NOT NULL
GROUP BY 1, 2, 3
"""


def customer_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: two-level aggregation (per-contract rollup, then per-customer)
    under a left-join chain, COLLECT_SET (sorted → csv string),
    COALESCE for customers with no financial data. Mirrors
    dags/3_silver_to_gold.py:245-287 with orders as f_contracts and the
    per-order lineitem rollup as financial_summary.
    """
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")

    fs = lineitem.groupBy("l_orderkey").agg(
        grid(F.sum(_amt()), 2).alias("saldo_contrato"),
        F.max("l_shipdate").alias("ultima_atividade_contrato"),
    )
    # aggregate at the orders grain FIRST, then join the (small)
    # per-customer rollup to customer attributes: the count-distinct
    # expand never carries customer columns, and the final join is
    # dim-sized. Same result as grouping the 3-way join directly —
    # the plan a 100 TB run wants.
    per_cust = (
        orders.join(fs, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_custkey")
        .agg(
            # o_orderkey is the orders PK — COUNT == COUNT DISTINCT per
            # group, and dropping DISTINCT removes one expand branch
            # from the multi-distinct aggregate
            F.count("o_orderkey").alias("total_contratos"),
            F.countDistinct("o_orderstatus").alias("categorias_produtos"),
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("produtos_utilizados"),
            grid(F.sum(F.coalesce(F.col("saldo_contrato"), F.lit(0.0))), 2).alias("saldo_total_cliente"),
            F.max("ultima_atividade_contrato").alias("ultima_atividade"),
        )
    )
    return customer.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segmento"),
        F.coalesce(F.col("total_contratos"), F.lit(0)).alias("total_contratos"),
        F.coalesce(F.col("categorias_produtos"), F.lit(0)).alias("categorias_produtos"),
        F.coalesce(F.col("produtos_utilizados"), F.lit("")).alias("produtos_utilizados"),
        F.coalesce(F.col("saldo_total_cliente"), F.lit(0.0)).alias("saldo_total_cliente"),
        F.col("ultima_atividade"),
    )


CUSTOMER_SUMMARY_SQL = f"""
WITH financial_summary AS (
    SELECT l_orderkey,
           {grid_sql(f"SUM({_AMT_SQL})", 2)} AS saldo_contrato,
           MAX(l_shipdate) AS ultima_atividade_contrato
    FROM lineitem
    GROUP BY l_orderkey
)
SELECT c_custkey AS customer_id,
       c_name AS customer_name,
       c_mktsegment AS segmento,
       COUNT(DISTINCT o_orderkey) AS total_contratos,
       COUNT(DISTINCT o_orderstatus) AS categorias_produtos,
       COALESCE(string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority), '') AS produtos_utilizados,
       {grid_sql("SUM(COALESCE(saldo_contrato, 0))", 2)} AS saldo_total_cliente,
       MAX(ultima_atividade_contrato) AS ultima_atividade
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
LEFT JOIN financial_summary ON o_orderkey = l_orderkey
GROUP BY 1, 2, 3
"""


def daily_transaction_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: group by (DATE(ts), type, is_financial-analog) with 8
    aggregates incl. sample STDDEV and COUNT DISTINCT. Mirrors
    dags/3_silver_to_gold.py:303-324 over the events table
    (event_type as transaction type; purchase/signup as "financial").
    STDDEV is derived from grid-snapped moment sums (n, Σx, Σx²) so
    both engines compute the identical double.
    """
    events = table(spark, sf_dir, "events")
    fin = F.col("event_type").isin("purchase", "signup")
    v = grid(F.col("value"), 2)
    agg = (
        events.where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.to_date("ts").alias("data_transacao"),
            F.col("event_type").alias("transaction_type_name"),
            fin.alias("is_financial"),
        )
        .agg(
            F.count(F.lit(1)).alias("quantidade_transacoes"),
            grid(F.sum(v), 2).alias("volume_total"),
            grid(F.sum(grid(v * v, 4)), 4).alias("__s2"),
            F.min(v).alias("valor_minimo"),
            F.max(v).alias("valor_maximo"),
            F.countDistinct("user_id").alias("clientes_unicos"),
            F.countDistinct(F.hour("ts")).alias("horas_ativas"),
        )
    )
    n = F.col("quantidade_transacoes")
    s1 = F.col("volume_total")
    s2 = F.col("__s2")
    variance = (s2 - s1 * s1 / n) / (n - 1)
    return agg.select(
        "data_transacao",
        "transaction_type_name",
        "is_financial",
        "quantidade_transacoes",
        "volume_total",
        grid(s1 / n, 4).alias("valor_medio"),
        F.when(n > 1, grid(F.sqrt(F.greatest(variance, F.lit(0.0))), 4)).alias("desvio_padrao"),
        "valor_minimo",
        "valor_maximo",
        "clientes_unicos",
        "horas_ativas",
    )


_V_SQL = grid_sql("value", 2)

DAILY_TRANSACTION_METRICS_SQL = f"""
WITH agg AS (
    SELECT CAST(ts AS DATE) AS data_transacao,
           event_type AS transaction_type_name,
           event_type IN ('purchase', 'signup') AS is_financial,
           COUNT(*) AS quantidade_transacoes,
           {grid_sql(f"SUM({_V_SQL})", 2)} AS volume_total,
           {grid_sql(f"SUM({grid_sql(f'({_V_SQL}) * ({_V_SQL})', 4)})", 4)} AS s2,
           MIN({_V_SQL}) AS valor_minimo,
           MAX({_V_SQL}) AS valor_maximo,
           COUNT(DISTINCT user_id) AS clientes_unicos,
           COUNT(DISTINCT hour(ts)) AS horas_ativas
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2, 3
)
SELECT data_transacao, transaction_type_name, is_financial, quantidade_transacoes, volume_total,
       {grid_sql("volume_total / quantidade_transacoes", 4)} AS valor_medio,
       CASE WHEN quantidade_transacoes > 1 THEN
            {grid_sql("sqrt(GREATEST((s2 - volume_total * volume_total / quantidade_transacoes) / (quantidade_transacoes - 1), 0.0))", 4)}
       END AS desvio_padrao,
       valor_minimo, valor_maximo, clientes_unicos, horas_ativas
FROM agg
"""


def product_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: CTE with a 4-way inner join + group-by-product metrics, then
    two global ROW_NUMBER rankings. Mirrors dags/3_silver_to_gold.py:368-392
    (lineitem⋈part⋈orders⋈supplier as txn⋈type⋈contract⋈product; brand as
    the product grain). Tie-break on p_brand pins the reference's
    arbitrary-tie ROW_NUMBER (SURVEY §7.3).
    """
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    supplier = table(spark, sf_dir, "supplier")
    amt = _amt()
    metrics = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_acctbal") > 0)
        .groupBy(F.col("p_brand").alias("product_name"))
        .agg(
            grid(F.sum(amt), 2).alias("volume_financeiro"),
            F.count(F.lit(1)).alias("quantidade_transacoes"),
            F.countDistinct("o_custkey").alias("clientes_unicos"),
            grid(grid(F.sum(amt), 2) / F.count(F.lit(1)), 4).alias("ticket_medio"),
        )
    )
    w_vol = Window.orderBy(F.col("volume_financeiro").desc(), F.col("product_name"))
    w_txn = Window.orderBy(F.col("quantidade_transacoes").desc(), F.col("product_name"))
    return metrics.select(
        "*",
        F.row_number().over(w_vol).alias("rank_volume"),
        F.row_number().over(w_txn).alias("rank_transacoes"),
    )


PRODUCT_RANKING_SQL = f"""
WITH product_metrics AS (
    SELECT p_brand AS product_name,
           {grid_sql(f"SUM({_AMT_SQL})", 2)} AS volume_financeiro,
           COUNT(*) AS quantidade_transacoes,
           COUNT(DISTINCT o_custkey) AS clientes_unicos,
           {grid_sql(grid_sql(f"SUM({_AMT_SQL})", 2) + " / COUNT(*)", 4)} AS ticket_medio
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal > 0
    GROUP BY p_brand
)
SELECT *,
       ROW_NUMBER() OVER (ORDER BY volume_financeiro DESC, product_name) AS rank_volume,
       ROW_NUMBER() OVER (ORDER BY quantidade_transacoes DESC, product_name) AS rank_transacoes
FROM product_metrics
"""


QUERIES = {
    "gold_monthly_balance": monthly_balance,
    "gold_customer_summary": customer_summary,
    "gold_daily_transaction_metrics": daily_transaction_metrics,
    "gold_product_ranking": product_ranking,
}

ORACLES = {
    "gold_monthly_balance": MONTHLY_BALANCE_SQL,
    "gold_customer_summary": CUSTOMER_SUMMARY_SQL,
    "gold_daily_transaction_metrics": DAILY_TRANSACTION_METRICS_SQL,
    "gold_product_ranking": PRODUCT_RANKING_SQL,
}
