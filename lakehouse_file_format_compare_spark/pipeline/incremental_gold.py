"""Incremental gold maintenance — the 100 TB replacement for the
reference's full-refresh gold (DROP + recreate every cycle,
dags/3_silver_to_gold.py:188; SURVEY §7.3 explicitly flags this as
the scale fix).

At 100 TB, recomputing monthly_balance over all history per cycle is
O(history); maintaining it from the new micro-batch's transactions is
O(batch). monthly_balance is distributive-aggregate-only
(SUM/COUNT/MAX, with AVG derived as sum/count), so append-only deltas
fold in exactly:

    combined = full_outer_join(gold, delta_gold, group_keys)
               sums/counts add, maxes take greatest, avg recomputed

Validity: correct for APPEND-ONLY facts. The fintech pipeline's
f_transactions PKs are unique per batch (batch-epoch-micros + i), so
silver merges are pure inserts and the precondition holds; a general
updating merge would need retraction handling (delta of old vs new
row), which full refresh sidesteps — keep full refresh for mutable
facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gold import monthly_balance

GROUP_KEYS = ("ano", "mes", "contract_id")


def _add(col: str) -> F.Column:
    return (F.coalesce(F.col(f"g.{col}"), F.lit(0.0)) + F.coalesce(F.col(f"d.{col}"), F.lit(0.0))).alias(col)


def incremental_monthly_balance(
    existing_gold: DataFrame,
    delta_transactions: DataFrame,
    d_transaction_types: DataFrame,
) -> DataFrame:
    """Fold an append-only transaction delta into the existing
    monthly_balance table. Only the delta is aggregated; the join
    touches existing groups only where the delta has rows (at scale:
    partition-pruned by (ano, mes) — the gold partition spec,
    3_…py:193)."""
    delta_gold = monthly_balance(delta_transactions, d_transaction_types)
    g = existing_gold.alias("g")
    d = delta_gold.alias("d")
    joined = g.join(d, on=list(GROUP_KEYS), how="full_outer")
    total = (
        F.coalesce(F.col("g.total_transacoes"), F.lit(0))
        + F.coalesce(F.col("d.total_transacoes"), F.lit(0))
    )
    saldo = (
        F.coalesce(F.col("g.saldo_liquido"), F.lit(0.0))
        + F.coalesce(F.col("d.saldo_liquido"), F.lit(0.0))
    )
    return joined.select(
        *GROUP_KEYS,
        _add("entradas"),
        _add("saidas"),
        saldo.alias("saldo_liquido"),
        total.alias("total_transacoes"),
        # AVG is algebraic: derivable from the maintained sums
        (saldo / total).alias("valor_medio_transacao"),
        # maior_entrada/maior_saida are MAX/MIN(amount) (signed, can be
        # negative/positive respectively) — greatest/least skip NULLs in
        # Spark, so a group present on only one side keeps its own value.
        F.greatest(F.col("g.maior_entrada"), F.col("d.maior_entrada")).alias("maior_entrada"),
        F.least(F.col("g.maior_saida"), F.col("d.maior_saida")).alias("maior_saida"),
    )
