"""Golden pipeline + property tests (SURVEY §5 plan #2/#3/#4):
end-to-end medallion run, merge-policy semantics, idempotency,
conservation invariants, format matrix.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.pipeline.runner import MedallionPipeline
from lakehouse_file_format_compare_spark.schemas import FINTECH_TABLE_CONFIGS
from lakehouse_file_format_compare_spark.storage import available_formats


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    p = MedallionPipeline(spark, str(tmp_path_factory.mktemp("warehouse")), formats=("parquet",))
    # two micro-batches → exercises watermark skip + upsert across batches
    p.run_bronze(n_customers=40, n_contracts=60, n_transactions=300, n_attributes=80)
    p.run_silver()
    p.run_bronze(n_customers=40, n_contracts=60, n_transactions=300, n_attributes=80)
    p.run_silver()
    p.run_gold()
    return p


def _silver(p, name):
    return p.warehouse.read_table("silver", name, "parquet", schema=FINTECH_TABLE_CONFIGS[name].schema)


def test_silver_pk_unique(pipeline):
    for name, cfg in FINTECH_TABLE_CONFIGS.items():
        df = _silver(pipeline, name)
        total = df.count()
        distinct = df.select(*cfg.key_columns).distinct().count()
        assert total == distinct, f"{name}: PK not unique after merge ({total} vs {distinct})"


def test_insert_only_keeps_first_version(pipeline):
    # static dims: batch 2 re-emits the same rows with a newer
    # ingestion_timestamp; insert-only must keep batch 1's rows
    # (dags/2_bronze_to_silver.py:266-276)
    df = _silver(pipeline, "d_country")
    stamps = [r["ts"] for r in df.select(F.col("ingestion_timestamp").alias("ts")).distinct().collect()]
    assert len(stamps) == 1, "static dim was updated by a later batch"


def test_upsert_accumulates_facts(pipeline):
    # two batches × 300 transactions, unique ids → 600 rows
    assert _silver(pipeline, "f_transactions").count() == 600
    # customers continue IDs across batches → 80 rows
    assert _silver(pipeline, "d_customers").count() == 80


def test_upsert_overwrites_colliding_pks(pipeline):
    # identifier_id restarts each batch (reference quirk) → the silver
    # table holds only ~one batch's worth, with batch 2's timestamps
    ident = _silver(pipeline, "d_customer_identifiers")
    max_ts = ident.agg(F.max("ingestion_timestamp")).collect()[0][0]
    n_old = ident.where(F.col("ingestion_timestamp") < F.lit(max_ts)).count()
    total = ident.count()
    assert total < 160, "identifier upsert did not overwrite colliding PKs"
    # every surviving row with a colliding id must be the latest version
    assert n_old <= total


def test_silver_rerun_is_idempotent(pipeline):
    # re-running silver with no new bronze rows must change nothing
    before = {n: _silver(pipeline, n).count() for n in FINTECH_TABLE_CONFIGS}
    reports = pipeline.run_silver(report_counts=True)
    after = {n: _silver(pipeline, n).count() for n in FINTECH_TABLE_CONFIGS}
    assert before == after
    # upsert tables: watermark must skip everything. Static dims
    # legitimately re-stage (their silver keeps batch-1 timestamps
    # while bronze re-emits newer ones — reference behavior,
    # dags/2_bronze_to_silver.py:205-214 + insert-only merge) but the
    # insert-only merge must discard them (checked via `before == after`).
    assert all(r.staged_rows == 0 for r in reports if r.policy == "upsert"), (
        "watermark did not skip already-loaded rows"
    )
    # default path skips the two reporting count() jobs: sentinel -1s,
    # and a no-new-rows rerun must still change nothing
    default_reports = pipeline.run_silver()
    assert all(r.bronze_rows == -1 and r.staged_rows == -1 for r in default_reports)
    assert {n: _silver(pipeline, n).count() for n in FINTECH_TABLE_CONFIGS} == after


def test_gold_conservation(pipeline):
    # Q1 invariant: entradas - saidas == saldo_liquido per group (3_…py:167-169)
    mb = pipeline.gold_frames()["monthly_balance"]
    bad = mb.where(F.abs(F.col("entradas") - F.col("saidas") - F.col("saldo_liquido")) > 1e-6).count()
    assert bad == 0


def test_gold_q1_q3_totals_agree(pipeline):
    # financial-only volume: Q1 total == Q3 total restricted to financial types
    mb = pipeline.gold_frames()["monthly_balance"]
    dm = pipeline.gold_frames()["daily_transaction_metrics"]
    t1 = mb.agg(F.sum("total_transacoes")).collect()[0][0]
    t3 = dm.where(F.col("is_financial")).agg(F.sum("quantidade_transacoes")).collect()[0][0]
    assert t1 == t3


def test_product_ranking_dense_and_complete(pipeline):
    pr = pipeline.gold_frames()["product_ranking"].collect()
    ranks = sorted(r["rank_volume"] for r in pr)
    assert ranks == list(range(1, len(pr) + 1))


def test_format_matrix_identical_results(spark, tmp_path_factory):
    # same logical pipeline through every available format must give
    # identical silver row-sets (SURVEY §5 plan #4)
    fmts = tuple(f for f in available_formats(spark) if f in ("parquet", "orc", "csv", "json", "avro"))
    p = MedallionPipeline(spark, str(tmp_path_factory.mktemp("fmtmatrix")), formats=fmts)
    p.run_bronze(n_customers=20, n_contracts=30, n_transactions=100, n_attributes=40)
    p.run_silver()
    frames = {
        f: p.warehouse.read_table("silver", "f_transactions", f,
                                  schema=FINTECH_TABLE_CONFIGS["f_transactions"].schema)
        for f in fmts
    }
    baseline = sorted(map(tuple, frames["parquet"].collect()))
    for f, df in frames.items():
        assert sorted(map(tuple, df.collect())) == baseline, f"format {f} diverges from parquet"


def test_generator_is_deterministic(spark, tmp_path_factory):
    from lakehouse_file_format_compare_spark.pipeline.generate import GeneratorState, generate_batch

    b1 = generate_batch(GeneratorState(seed=7), n_customers=10, n_contracts=10,
                        n_transactions=20, n_attributes=10)
    b2 = generate_batch(GeneratorState(seed=7), n_customers=10, n_contracts=10,
                        n_transactions=20, n_attributes=10)
    assert b1 == b2


def test_customer_summary_degraded_no_financial(spark, pipeline):
    # 3_…py:226-242: customers/contracts/products only — zero balances,
    # CAST(NULL AS TIMESTAMP) activity
    from lakehouse_file_format_compare_spark.pipeline import gold as pgold

    out = pgold.customer_summary(
        _silver(pipeline, "d_customers"),
        _silver(pipeline, "f_contracts"),
        _silver(pipeline, "d_products"),
    ).collect()
    assert len(out) == 80
    assert all(r.saldo_total == 0.0 and r.ultima_atividade is None for r in out)
    assert any(r.total_contratos > 0 for r in out)


def test_product_ranking_degraded_contracts_only(spark, pipeline):
    # 3_…py:350-365: no financial transactions → contracts-only metrics
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.pipeline import gold as pgold

    empty_txn = _silver(pipeline, "f_transactions").where(F.lit(False))
    out = pgold.product_ranking(
        empty_txn,
        _silver(pipeline, "d_transaction_types"),
        _silver(pipeline, "f_contracts"),
        _silver(pipeline, "d_products"),
        has_financial=False,
    ).collect()
    assert len(out) == 8
    assert all(r.volume_financeiro == 0.0 and r.total_transacoes == 0 for r in out)
    # reference emits CONSTANT 1 for both ranks in the degraded
    # variant (3_…py:359-360) — matched verbatim since round 3
    assert all(r.rank_volume == 1 and r.rank_transacoes == 1 for r in out)
