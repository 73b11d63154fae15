"""Load the driver's TESTDATA parquet tables (TESTDATA.md).

Counterpart of the reference's source operators S4/S5 (parquet path
scan / catalog table scan — SURVEY §2.1). Schemas are pinned
(schemas.TESTDATA_SCHEMAS): we read with the declared schema so column
pruning and predicate pushdown operate on known types, and so an
upstream type drift fails loudly instead of silently changing results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES
from ..session import apply_runtime_defaults

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its pinned schema.

    events.ts is nanosecond-precision naive parquet (illegal as a
    Spark 4 timestamp): it is read as raw nanos (LongType) under
    ``nanosAsLong`` and converted to a micros TimestampType here, the
    same truncation DuckDB applies.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown testdata table {name!r}")
    apply_runtime_defaults(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(
        os.path.join(sf_dir, f"{name}.parquet")
    )
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return {name: table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view (ad-hoc SQL surface,
    mirroring the reference's temp-view pattern at
    dags/3_silver_to_gold.py:122-130)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
