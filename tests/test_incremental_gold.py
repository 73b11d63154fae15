"""Incremental gold maintenance must equal full refresh on the union
(the invariant that lets 100 TB gold run O(batch) per cycle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.pipeline.generate import (
    GeneratorState,
    batch_to_dataframes,
    generate_batch,
)
from lakehouse_file_format_compare_spark.pipeline.gold import monthly_balance
from lakehouse_file_format_compare_spark.pipeline.incremental_gold import (
    incremental_monthly_balance,
)


def _frames(spark, state, **sizes):
    return batch_to_dataframes(spark, generate_batch(state, **sizes))


def test_incremental_equals_full_refresh(spark):
    state = GeneratorState(seed=11)
    b1 = _frames(spark, state, n_customers=30, n_contracts=40, n_transactions=400, n_attributes=50)
    b2 = _frames(spark, state, n_customers=30, n_contracts=40, n_transactions=400, n_attributes=50)
    types = b1["d_transaction_types"]

    full = monthly_balance(b1["f_transactions"].unionByName(b2["f_transactions"]), types)
    gold1 = monthly_balance(b1["f_transactions"], types)
    incr = incremental_monthly_balance(gold1, b2["f_transactions"], types)

    def canon(df):
        return sorted(
            (r["ano"], r["mes"], r["contract_id"], round(r["entradas"], 6),
             round(r["saidas"], 6), round(r["saldo_liquido"], 6), r["total_transacoes"],
             round(r["valor_medio_transacao"], 6), round(r["maior_entrada"], 6),
             round(r["maior_saida"], 6))
            for r in df.collect()
        )

    assert canon(incr) == canon(full)


def test_incremental_touches_only_delta_groups(spark):
    # groups untouched by the delta keep their values bit-for-bit
    state = GeneratorState(seed=12)
    b1 = _frames(spark, state, n_customers=20, n_contracts=30, n_transactions=300, n_attributes=40)
    types = b1["d_transaction_types"]
    gold1 = monthly_balance(b1["f_transactions"], types).cache()
    empty_delta = b1["f_transactions"].where(F.lit(False))
    incr = incremental_monthly_balance(gold1, empty_delta, types)
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, gold1.collect()))


def test_runner_incremental_gold_equals_full(spark, tmp_path_factory):
    from lakehouse_file_format_compare_spark.pipeline.runner import MedallionPipeline

    p = MedallionPipeline(spark, str(tmp_path_factory.mktemp("incr_wh")))
    for _ in range(3):
        p.run_bronze(n_customers=15, n_contracts=20, n_transactions=150, n_attributes=20)
        p.run_silver()
        p.run_gold_incremental()

    full = monthly_balance(
        p._silver("f_transactions", "parquet"), p._silver("d_transaction_types", "parquet")
    )
    incr = p.warehouse.read_table("gold", "monthly_balance_inc", "parquet")
    assert p.warehouse.current_version("gold", "monthly_balance_inc") == 3

    def canon(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in (r[c] for c in cols))
            for r in df.collect()
        )

    assert canon(incr) == canon(full)
