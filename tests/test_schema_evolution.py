"""Additive schema evolution on snapshot-versioned merge targets
(storage.py::evolve_schemas + merge_table(merge_schema=True)) — the
Delta mergeSchema / Iceberg add-column semantics scaled down to the
manifest-pointer table layer: new columns appear for ALL rows (old
ones read NULL), numeric columns widen safely, incompatible changes
raise, and earlier snapshots keep the schema they were written with."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.storage import Warehouse, evolve_schemas


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _v1(spark):
    return spark.range(4).select(
        F.col("id").alias("k"), F.lit(1.0).cast("double").alias("price")
    )


def _v2_plus_col(spark):
    return spark.range(2, 6).select(
        F.col("id").alias("k"),
        F.lit(2.0).cast("double").alias("price"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("channel"),
    )


def test_add_column_backfills_null_and_time_travel_keeps_old_schema(spark, wh):
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    wh.merge_table(
        _v2_plus_col(spark), "silver", "t", keys=["k"], merge_schema=True
    )
    cur = {r["k"]: r for r in wh.read_table("silver", "t").collect()}
    assert set(wh.read_table("silver", "t").columns) == {"k", "price", "channel"}
    assert len(cur) == 6
    # untouched old rows read NULL in the new column; merged rows carry it
    assert cur[0]["channel"] is None and cur[0]["price"] == 1.0
    assert cur[3]["channel"] == "c3" and cur[3]["price"] == 2.0
    # snapshot 1 still has the ORIGINAL two-column schema
    v1 = wh.read_table("silver", "t", version=1)
    assert v1.columns == ["k", "price"]
    # manifest records both schemas + the add op, no data files opened
    hist = dict(wh.schema_history("silver", "t"))
    assert [c for c, _ in hist[1]] == ["k", "price"]
    assert [c for c, _ in hist[2]] == ["k", "price", "channel"]
    ops = [v["op"] for v in wh.history("silver", "t")]
    assert ops == ["create", "merge_upsert+add:channel"]


def test_without_flag_extra_staging_columns_are_dropped(spark, wh):
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    wh.merge_table(_v2_plus_col(spark), "silver", "t", keys=["k"])
    assert set(wh.read_table("silver", "t").columns) == {"k", "price"}


def test_numeric_widening_int_to_bigint(spark, wh):
    t = spark.range(3).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("qty")
    )
    s = spark.range(2, 5).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("bigint").alias("qty")
    )
    wh.merge_table(t, "silver", "w", keys=["k"])
    wh.merge_table(s, "silver", "w", keys=["k"], merge_schema=True)
    out = wh.read_table("silver", "w")
    assert dict(out.dtypes)["qty"] == "bigint"
    vals = {r["k"]: r["qty"] for r in out.collect()}
    assert vals == {0: 0, 1: 1, 2: 20, 3: 30, 4: 40}


def test_incompatible_type_change_raises(spark, wh):
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    bad = spark.range(2).select(
        F.col("id").alias("k"), F.lit("oops").alias("price")
    )
    with pytest.raises(ValueError, match="incompatible type change"):
        wh.merge_table(bad, "silver", "t", keys=["k"], merge_schema=True)


def test_staging_missing_target_column_still_raises(spark, wh):
    """Evolution is ADDITIVE only: UPDATE SET * needs full staging
    rows, so a staging frame missing an existing column fails loudly
    rather than nulling matched rows."""
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    narrow = spark.range(2).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="missing target columns"):
        wh.merge_table(narrow, "silver", "t", keys=["k"], merge_schema=True)


def test_rollback_composes_with_evolution(spark, wh):
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    wh.merge_table(_v2_plus_col(spark), "silver", "t", keys=["k"], merge_schema=True)
    wh.rollback("silver", "t", "parquet", version=1)
    assert wh.read_table("silver", "t").columns == ["k", "price"]
    # a fresh evolving merge after rollback re-adds the column as a
    # NEW snapshot (ids never reused)
    wh.merge_table(_v2_plus_col(spark), "silver", "t", keys=["k"], merge_schema=True)
    assert set(wh.read_table("silver", "t").columns) == {"k", "price", "channel"}


def test_evolved_column_is_queryable_with_nulls(spark, wh):
    wh.merge_table(_v1(spark), "silver", "t", keys=["k"])
    wh.merge_table(_v2_plus_col(spark), "silver", "t", keys=["k"], merge_schema=True)
    out = (
        wh.read_table("silver", "t")
        .groupBy(F.col("channel").isNull().alias("is_old"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["is_old"]: r["n"] for r in out} == {True: 2, False: 4}


def test_evolve_schemas_helper_is_pure(spark):
    t = spark.range(2).select(F.col("id").alias("k"), F.lit(1).cast("int").alias("a"))
    s = spark.range(2).select(
        F.col("id").alias("k"),
        F.lit(2).cast("bigint").alias("a"),
        F.lit("x").alias("b"),
    )
    t2, s2, added = evolve_schemas(t, s)
    assert added == ["b"]
    assert dict(t2.dtypes) == {"k": "bigint", "a": "bigint", "b": "string"}
    assert [c for c in s2.columns] == ["k", "a", "b"]
    # no-op when schemas already agree
    t3, s3, added3 = evolve_schemas(t2, s2)
    assert added3 == [] and t3.columns == t2.columns


# ---------------------------------------------------------------------------
# partitioned COW path: add-column only (widening would need carried
# partitions rewritten — rejected explicitly)
# ---------------------------------------------------------------------------


def _pbatch(spark, months, price, channel=None):
    df = spark.range(4).crossJoin(
        spark.createDataFrame([(m,) for m in months], "mes int")
    ).select(
        (F.col("id") + F.col("mes") * 100).alias("k"),
        "mes",
        F.lit(price).cast("double").alias("price"),
    )
    if channel is not None:
        df = df.withColumn("channel", F.lit(channel))
    return df


def test_partitioned_add_column_backfills_carried_partitions(spark, wh):
    wh.merge_table_partitioned(
        _pbatch(spark, [1, 2], 1.0), "gold", "pe", keys=["k"], partition_col="mes"
    )
    # touch only month 2 with the evolved batch; month 1 is carried
    r = wh.merge_table_partitioned(
        _pbatch(spark, [2], 2.0, channel="web"),
        "gold", "pe", keys=["k"], partition_col="mes", merge_schema=True,
    )
    assert r["touched"] == [2]
    cur = wh.read_table_partitioned("gold", "pe")
    assert set(cur.columns) == {"k", "mes", "price", "channel"}
    rows = {(r["mes"], r["k"]): r for r in cur.collect()}
    assert len(rows) == 8
    # carried month-1 files predate the column: NULL back-fill
    assert all(r["channel"] is None for (m, _), r in rows.items() if m == 1)
    assert all(r["channel"] == "web" for (m, _), r in rows.items() if m == 2)
    # time travel: v1 keeps the pre-evolution schema
    v1 = wh.read_table_partitioned("gold", "pe", version=1)
    assert set(v1.columns) == {"k", "mes", "price"}
    ops = [e["op"] for e in wh.history("gold", "pe")]
    assert ops[-1] == "merge_upsert_partitioned+add:channel"


def test_partitioned_new_partition_with_new_column(spark, wh):
    """Evolution via a batch that ONLY creates a new partition (no old
    files read): the union schema still lands in the manifest and the
    carried partitions back-fill NULL."""
    wh.merge_table_partitioned(
        _pbatch(spark, [1], 1.0), "gold", "pn", keys=["k"], partition_col="mes"
    )
    wh.merge_table_partitioned(
        _pbatch(spark, [9], 3.0, channel="app"),
        "gold", "pn", keys=["k"], partition_col="mes", merge_schema=True,
    )
    cur = wh.read_table_partitioned("gold", "pn")
    assert set(cur.columns) == {"k", "mes", "price", "channel"}
    got = {r["mes"]: r["channel"] for r in cur.collect()}
    assert got[1] is None and got[9] == "app"


def test_partitioned_widening_is_rejected(spark, wh):
    wh.merge_table_partitioned(
        spark.range(3).select(
            F.col("id").alias("k"), F.lit(1).alias("mes").cast("int"),
            F.col("id").cast("int").alias("qty"),
        ),
        "gold", "pw", keys=["k"], partition_col="mes",
    )
    widened = spark.range(3).select(
        F.col("id").alias("k"), F.lit(1).cast("int").alias("mes"),
        F.col("id").cast("bigint").alias("qty"),
    )
    with pytest.raises(ValueError, match="add-column only"):
        wh.merge_table_partitioned(
            widened, "gold", "pw", keys=["k"], partition_col="mes",
            merge_schema=True,
        )


def test_partitioned_without_flag_drops_extra_columns(spark, wh):
    wh.merge_table_partitioned(
        _pbatch(spark, [1], 1.0), "gold", "pd", keys=["k"], partition_col="mes"
    )
    wh.merge_table_partitioned(
        _pbatch(spark, [1], 2.0, channel="web"),
        "gold", "pd", keys=["k"], partition_col="mes",
    )
    assert set(wh.read_table_partitioned("gold", "pd").columns) == {"k", "mes", "price"}
