"""Load the driver's TESTDATA parquet tables (TESTDATA.md).

Counterpart of the reference's source operators S4/S5 (parquet path
scan / catalog table scan — SURVEY §2.1). Schemas are pinned
(schemas.TESTDATA_SCHEMAS): we read with the declared schema so column
pruning and predicate pushdown operate on known types, and so an
upstream type drift fails loudly instead of silently changing results.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

from ..schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES
from ..session import apply_runtime_defaults

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# events.ts read as a plain micros timestamp (used when the parquet
# physical type is already us/ms precision).
_EVENTS_TS_TIMESTAMP_SCHEMA = StructType(
    [
        f if f.name != "ts" else StructField("ts", TimestampType(), True)
        for f in TESTDATA_SCHEMAS["events"].fields
    ]
)


@functools.lru_cache(maxsize=None)
def _events_ts_is_nanos_cached(path: str, mtime_ns: int) -> bool:
    try:
        import pyarrow.parquet as pq
    except ImportError:
        # No pyarrow → assume micros (the Spark read will fail loudly
        # with PARQUET_TYPE_ILLEGAL if it is actually nanos, rather
        # than us silently masking a broken probe).
        return False
    return getattr(pq.read_schema(path).field("ts").type, "unit", None) == "ns"


def _events_ts_is_nanos(path: str) -> bool:
    """Probe the parquet footer for events.ts precision.

    Bounded metadata-only read (one footer), cached per (path, mtime)
    so a regenerated file at the same path (the driver rewrites
    testdata between rounds) re-probes instead of serving a stale
    answer. Only ImportError is swallowed — a genuine probe failure
    (corrupt footer, missing column) surfaces.
    """
    try:
        mtime_ns = os.stat(path).st_mtime_ns
    except OSError:
        mtime_ns = -1
    return _events_ts_is_nanos_cached(path, mtime_ns)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its pinned schema.

    When events.ts is nanosecond-precision naive parquet (illegal as a
    Spark 4 timestamp, [PARQUET_TYPE_ILLEGAL]) it is read as raw nanos
    (LongType) under ``nanosAsLong`` and converted to a micros
    TimestampType here, the same truncation DuckDB applies; when the
    file is already micros it is read directly as TimestampType.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown testdata table {name!r}")
    apply_runtime_defaults(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_is_nanos(path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return spark.read.schema(_EVENTS_TS_TIMESTAMP_SCHEMA).parquet(path)
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


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
