"""Structured Streaming runner: the streaming silver path must
produce exactly the same silver tables as the batch path (SURVEY §2.9
contract), draining incrementally with checkpoint-based progress."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.pipeline.runner import MedallionPipeline
from lakehouse_file_format_compare_spark.schemas import FINTECH_TABLE_CONFIGS
from lakehouse_file_format_compare_spark.storage import Warehouse
from lakehouse_file_format_compare_spark.streaming import StreamingSilverLoader

TABLES = ("d_country", "d_customers", "f_transactions")


@pytest.fixture(scope="module")
def dual_warehouses(spark, tmp_path_factory):
    batch_root = str(tmp_path_factory.mktemp("batch_wh"))
    stream_root = str(tmp_path_factory.mktemp("stream_wh"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    batch_p = MedallionPipeline(spark, batch_root, formats=("parquet",))
    stream_p = MedallionPipeline(spark, stream_root, formats=("parquet",))
    loader = StreamingSilverLoader(Warehouse(spark, stream_root), ckpt)

    for _ in range(2):
        batch_p.run_bronze(n_customers=20, n_contracts=30, n_transactions=150, n_attributes=40)
        batch_p.run_silver()
        stream_p.run_bronze(n_customers=20, n_contracts=30, n_transactions=150, n_attributes=40)
        loader.run(TABLES)
    return batch_p, stream_p


def _read(p, name):
    return p.warehouse.read_table("silver", name, "parquet", schema=FINTECH_TABLE_CONFIGS[name].schema)


@pytest.mark.parametrize("name", TABLES)
def test_streaming_matches_batch_silver(dual_warehouses, name):
    batch_p, stream_p = dual_warehouses
    b = sorted(map(tuple, _read(batch_p, name).collect()))
    s = sorted(map(tuple, _read(stream_p, name).collect()))
    assert b == s, f"streaming silver diverges from batch silver for {name}"


def test_streaming_rerun_is_noop(dual_warehouses, spark):
    # draining again with no new files must not change the table
    _, stream_p = dual_warehouses
    before = _read(stream_p, "f_transactions").count()
    loader = StreamingSilverLoader(
        Warehouse(spark, stream_p.root), stream_p.root + "/../ckpt_reuse_fail"
    )
    # fresh checkpoint would re-read everything — merge idempotency
    # (keyed upsert) must still keep counts identical
    loader.run(("f_transactions",))
    assert _read(stream_p, "f_transactions").count() == before


def test_bounded_micro_batches_match_single_drain(spark, tmp_path_factory):
    # maxFilesPerTrigger=1 → many small keyed merges; final silver must
    # equal the unbounded drain (merge idempotency under micro-batching)
    root = str(tmp_path_factory.mktemp("bounded_wh"))
    p = MedallionPipeline(spark, root, formats=("parquet",))
    p.run_bronze(n_customers=10, n_contracts=15, n_transactions=60, n_attributes=10)
    p.run_bronze(n_customers=10, n_contracts=15, n_transactions=60, n_attributes=10)
    loader = StreamingSilverLoader(
        Warehouse(spark, root), str(tmp_path_factory.mktemp("ck_bounded")),
        max_files_per_trigger=1,
    )
    loader.run(("f_transactions",))
    got = _read(p, "f_transactions").count()
    assert got == 120


def test_streaming_scd2_matches_batch_apply(spark, tmp_path_factory):
    """Streaming SCD2 (foreachBatch -> Warehouse.scd2_table) drained
    batch-by-batch equals the pure batch scd2_apply chain, and a
    rerun with no new files is a no-op (checkpointed progress)."""
    import datetime

    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.merge import scd2_apply
    from lakehouse_file_format_compare_spark.streaming import StreamingScd2Loader

    root = str(tmp_path_factory.mktemp("scd2_stream_wh"))
    bronze = str(tmp_path_factory.mktemp("scd2_bronze"))
    ckpt = str(tmp_path_factory.mktemp("scd2_ckpt"))
    wh = Warehouse(spark, root)
    loader = StreamingScd2Loader(wh, ckpt)
    schema = "id long, name string, tier string, effective_date date"
    d1, d2 = datetime.date(2025, 3, 1), datetime.date(2025, 6, 1)

    b1 = spark.createDataFrame(
        [(1, "alice", "gold", d1), (2, "bob", "silver", d1)], schema
    )
    b2 = spark.createDataFrame(
        [(1, "alice", "platinum", d2), (3, "carol", "bronze", d2)], schema
    )
    run = lambda: loader.run(
        bronze, "dim_customer", schema, keys=("id",),
        compare_cols=("name", "tier"),
    )
    b1.write.mode("append").parquet(bronze)
    run()
    b2.write.mode("append").parquet(bronze)
    run()

    got = sorted(map(tuple, wh.read_table("silver", "dim_customer").collect()))
    hist1 = b1.select(
        "id", "name", "tier",
        F.col("effective_date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    want = sorted(map(tuple, scd2_apply(
        hist1, b2, keys=["id"], compare_cols=["name", "tier"]
    ).collect()))
    assert got == want

    v_before = wh.current_version("silver", "dim_customer")
    run()  # no new files: checkpoint makes this a no-op
    assert wh.current_version("silver", "dim_customer") == v_before
    assert sorted(map(tuple, wh.read_table("silver", "dim_customer").collect())) == want
