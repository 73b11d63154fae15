"""Catalog / DDL surface (SURVEY §2.11, C1-C6).

The reference manages tables through two Iceberg catalogs over a Hive
metastore (dags/2_bronze_to_silver.py:31-44); this engine uses the
built-in ``spark_catalog`` with a local warehouse by default — the
same API, zero infra — and takes external catalogs purely as session
config (session.py ``extra_conf``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str) -> None:
    """C1 (2_…py:67): CREATE DATABASE IF NOT EXISTS."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def table_exists(spark: SparkSession, name: str) -> bool:
    """C2 (2_…py:239)."""
    return spark.catalog.tableExists(name)


def save_table(
    df: DataFrame,
    name: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """K3-analog through the catalog: managed CTAS (saveAsTable)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """K8 (3_…py:188): DROP TABLE IF EXISTS (full-refresh pattern)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def register_temp_view(df: DataFrame, name: str) -> None:
    """C3 (2_…py:229)."""
    df.createOrReplaceTempView(name)


def drop_temp_view(spark: SparkSession, name: str) -> None:
    """C4 (2_…py:305)."""
    spark.catalog.dropTempView(name)


def row_count(spark: SparkSession, name: str) -> int:
    """C5 validation probe (2_…py:296) — lazy metadata-friendly count."""
    return spark.table(name).count()


def save_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    fmt: str = "parquet",
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: pre-shuffles data into ``n_buckets`` by
    ``bucket_cols`` at write time so later equi-joins/aggregations on
    those columns skip their shuffle entirely (the Exchange disappears
    from the plan — asserted in tests/test_plan_quality.py).

    The 100 TB pattern: bucket both sides of a recurring fact-fact
    join by the join key once, then every subsequent join is
    co-located. The reference reshuffles on every silver merge and
    gold rebuild; bucketing amortizes that cost across cycles.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def analyze_table(spark: SparkSession, name: str, columns: list[str] | None = None) -> None:
    """Collect table (and optionally column) statistics for Catalyst's
    cost-based optimizer — join reordering and broadcast decisions get
    real cardinalities instead of file-size guesses. The reference
    never analyzes (SURVEY §4: CBO 'available; nothing custom'); at
    100 TB, stats-driven planning is what keeps 6-way joins sane."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, name: str) -> dict:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    stats = next((r["data_type"] for r in rows if r["col_name"] == "Statistics"), None)
    return {"statistics": stats}
