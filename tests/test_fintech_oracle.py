"""Differential DuckDB oracle for the REFERENCE-EXACT fintech gold
queries (pipeline/gold.py): run each gold query in Spark over seeded
generated data and the equivalent SQL (translated from
dags/3_silver_to_gold.py:162-402) in DuckDB over the same rows."""

from __future__ import annotations

import duckdb
import pytest

from lakehouse_file_format_compare_spark.plans.fintech_plans import _frames
from lakehouse_file_format_compare_spark.pipeline import gold


@pytest.fixture(scope="module")
def data(spark):
    frames = _frames(spark)
    con = duckdb.connect()
    pandas_frames = {}
    for name in ["f_transactions", "d_transaction_types", "d_customers",
                 "f_contracts", "d_products"]:
        pandas_frames[name] = frames[name].toPandas()
        con.register(name, pandas_frames[name])
    return frames, con


def _assert_match(got_rows, want_rows, n_keys):
    """Key-based compare with float tolerance (the pipeline queries are
    reference-exact unrounded doubles; engines differ in last-ulp
    summation order)."""
    import math

    def canon(v):
        return tuple(sorted(v)) if isinstance(v, list) else v

    def index(rows):
        out = {}
        for row in rows:
            out[tuple(row[:n_keys])] = [canon(v) for v in row[n_keys:]]
        assert len(out) == len(rows), "duplicate group keys"
        return out

    g, w = index(got_rows), index(want_rows)
    assert set(g) == set(w), f"group keys differ: {set(g) ^ set(w)}"
    for key, gv in g.items():
        for a, b in zip(gv, w[key]):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-6), (key, a, b)
            else:
                assert a == b, (key, a, b)


def test_q1_monthly_balance_matches_reference_sql(spark, data):
    frames, con = data
    got = [tuple(r) for r in gold.monthly_balance(
        frames["f_transactions"], frames["d_transaction_types"]).collect()]
    want = con.execute("""
        SELECT year(to_timestamp(t.completed_at_time_id)) AS ano,
               month(to_timestamp(t.completed_at_time_id)) AS mes,
               t.contract_id,
               SUM(CASE WHEN t.amount > 0 THEN t.amount ELSE 0 END) AS entradas,
               SUM(CASE WHEN t.amount < 0 THEN ABS(t.amount) ELSE 0 END) AS saidas,
               SUM(t.amount) AS saldo_liquido,
               COUNT(*) AS total_transacoes,
               AVG(t.amount) AS valor_medio_transacao,
               MAX(t.amount) AS maior_entrada,
               MIN(t.amount) AS maior_saida
        FROM f_transactions t
        JOIN d_transaction_types tt USING (transaction_type_id)
        WHERE tt.is_financial = true AND to_timestamp(t.completed_at_time_id) IS NOT NULL
        GROUP BY 1, 2, 3
    """).fetchall()
    _assert_match(got, want, n_keys=3)


def test_q3_daily_metrics_matches_reference_sql(spark, data):
    frames, con = data
    got = [tuple(r) for r in gold.daily_transaction_metrics(
        frames["f_transactions"], frames["d_transaction_types"]).collect()]
    want = con.execute("""
        SELECT CAST(to_timestamp(t.completed_at_time_id) AS DATE) AS data_transacao,
               tt.transaction_type_name,
               tt.is_financial,
               COUNT(*) AS quantidade_transacoes,
               SUM(t.amount) AS volume_total,
               AVG(t.amount) AS valor_medio,
               stddev_samp(t.amount) AS desvio_padrao,
               MIN(t.amount) AS valor_minimo,
               MAX(t.amount) AS valor_maximo,
               COUNT(DISTINCT t.contract_id) AS contratos_unicos
        FROM f_transactions t
        JOIN d_transaction_types tt USING (transaction_type_id)
        WHERE tt.is_financial = true AND to_timestamp(t.completed_at_time_id) IS NOT NULL
        GROUP BY 1, 2, 3
    """).fetchall()
    _assert_match(got, want, n_keys=3)


def test_q4_product_ranking_matches_reference_sql(spark, data):
    frames, con = data
    got = [tuple(r) for r in gold.product_ranking(
        frames["f_transactions"], frames["d_transaction_types"],
        frames["f_contracts"], frames["d_products"]).collect()]
    want = con.execute("""
        WITH product_metrics AS (
            SELECT p.product_name, p.product_category,
                   COUNT(*) AS total_transacoes,
                   SUM(t.amount) AS volume_financeiro,
                   COUNT(DISTINCT c.contract_id) AS contratos_ativos,
                   COUNT(DISTINCT c.customer_id) AS clientes_unicos,
                   AVG(t.amount) AS ticket_medio
            FROM f_transactions t
            JOIN d_transaction_types tt USING (transaction_type_id)
            JOIN f_contracts c USING (contract_id)
            JOIN d_products p USING (product_id)
            WHERE tt.is_financial = true AND to_timestamp(t.completed_at_time_id) IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY volume_financeiro DESC, product_name) AS rank_volume,
               ROW_NUMBER() OVER (ORDER BY total_transacoes DESC, product_name) AS rank_transacoes
        FROM product_metrics
    """).fetchall()
    _assert_match(got, want, n_keys=2)


def test_q2_customer_summary_matches_reference_sql(spark, data):
    frames, con = data
    got = [tuple(r) for r in gold.customer_summary(
        frames["d_customers"], frames["f_contracts"], frames["d_products"],
        frames["f_transactions"], frames["d_transaction_types"]).collect()]
    want = con.execute("""
        WITH financial_summary AS (
            SELECT t.contract_id,
                   SUM(t.amount) AS saldo_contrato,
                   COUNT(*) AS txns_contrato,
                   MAX(make_timestamp(t.completed_at_time_id * 1000000)) AS ultima_atividade_contrato
            FROM f_transactions t
            JOIN d_transaction_types tt USING (transaction_type_id)
            WHERE tt.is_financial = true AND to_timestamp(t.completed_at_time_id) IS NOT NULL
            GROUP BY 1
        )
        SELECT cu.customer_id, cu.first_name, cu.last_name,
               COUNT(DISTINCT c.contract_id) AS total_contratos,
               COUNT(DISTINCT p.product_category) AS categorias_produtos,
               SUM(COALESCE(fs.saldo_contrato, 0)) AS saldo_total,
               SUM(COALESCE(fs.txns_contrato, 0)) AS total_transacoes,
               MAX(fs.ultima_atividade_contrato) AS ultima_atividade,
               COALESCE(list_sort(list_distinct(list(p.product_category) FILTER (p.product_category IS NOT NULL))), []) AS produtos_utilizados
        FROM d_customers cu
        LEFT JOIN f_contracts c USING (customer_id)
        LEFT JOIN d_products p USING (product_id)
        LEFT JOIN financial_summary fs ON c.contract_id = fs.contract_id
        GROUP BY 1, 2, 3
    """).fetchall()
    _assert_match(got, want, n_keys=3)
