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
