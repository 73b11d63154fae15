"""Snapshot versioning of merge targets: metadata-pointer commits,
time travel, rollback — the local-FS scale-down of Iceberg snapshots
the reference relies on for its silver merges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.storage import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _orders(spark, n, price):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(price).cast("double").alias("price")
    )


def test_merge_commits_versions(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    assert wh.current_version("silver", "t") == 2
    ops = [v["op"] for v in wh.history("silver", "t")]
    assert ops == ["create", "merge_upsert"]
    # current: 8 rows all at price 2.0 (upsert overwrote)
    cur = wh.read_table("silver", "t").collect()
    assert len(cur) == 8 and all(r.price == 2.0 for r in cur)


def test_time_travel_reads_old_snapshot(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    v1 = wh.read_table("silver", "t", version=1).collect()
    assert len(v1) == 5 and all(r.price == 1.0 for r in v1)


def test_rollback_is_metadata_only(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    wh.rollback("silver", "t", "parquet", 1)
    assert wh.read_table("silver", "t").count() == 5
    # rolling forward again still possible: v2 data untouched
    assert wh.read_table("silver", "t", version=2).count() == 8
    # a new merge on top of the rollback builds from v1
    wh.merge_table(_orders(spark, 2, 9.0), "silver", "t", keys=["k"])
    cur = {r.k: r.price for r in wh.read_table("silver", "t").collect()}
    assert len(cur) == 5 and cur[0] == 9.0 and cur[4] == 1.0


def test_rollback_unknown_version_rejected(spark, wh):
    wh.merge_table(_orders(spark, 3, 1.0), "silver", "t", keys=["k"])
    with pytest.raises(ValueError):
        wh.rollback("silver", "t", "parquet", 7)


def test_plain_tables_unaffected(spark, wh):
    wh.write_table(_orders(spark, 4, 1.0), "gold", "plain")
    assert wh.exists("gold", "plain", "parquet")
    assert wh.current_version("gold", "plain") is None
    with pytest.raises(ValueError):
        wh.read_table("gold", "plain", version=1)
