"""Format-comparison harness — the reference's core purpose
(README.md:1-20 of the reference: "compare Iceberg file formats by
running the identical workload into all three side by side").

Runs the identical workload per storage format and reports timings:

  write   land the fact + dim tables in the format
  scan    full-table scan (forces column decode of every column)
  query   the gold-analog workload over the stored tables

The reference never *measures* (no timings anywhere — BASELINE.md);
this harness produces the numbers its architecture exists to compare.
Formats come from storage.available_formats (avro/delta/iceberg join
automatically when their jars are present).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .schemas import TESTDATA_SCHEMAS
from .sources.testdata import table
from .storage import Warehouse, available_formats

BENCH_TABLES = ("lineitem", "orders", "customer", "supplier", "part")


@dataclass
class FormatTiming:
    fmt: str
    write_sec: float
    scan_sec: float
    query_sec: float
    size_bytes: int


def _dir_size(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _gold_workload(wh: Warehouse, fmt: str):
    """The monthly-balance-shaped query over stored tables (join +
    conditional aggregation), mirroring plans/gold.py Q1."""
    li = wh.read_table("bench", "lineitem", fmt, schema=TESTDATA_SCHEMAS["lineitem"])
    supp = wh.read_table("bench", "supplier", fmt, schema=TESTDATA_SCHEMAS["supplier"])
    amt = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_acctbal") > 0)
        .groupBy(F.year("l_shipdate"), F.month("l_shipdate"), "l_suppkey")
        .agg(F.sum(amt), F.count(F.lit(1)), F.avg(amt), F.max(amt), F.min(amt))
    )


def run_format_bench(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    formats: tuple[str, ...] | None = None,
) -> list[FormatTiming]:
    wh = Warehouse(spark, root)
    formats = formats or available_formats(spark)
    source = {name: table(spark, sf_dir, name).cache() for name in BENCH_TABLES}
    for df in source.values():
        df.count()  # materialize cache so write timing excludes the parquet read

    results = []
    for fmt in formats:
        t0 = time.perf_counter()
        for name, df in source.items():
            wh.write_table(df, "bench", name, fmt)
        write_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        for name in BENCH_TABLES:
            wh.read_table("bench", name, fmt, schema=TESTDATA_SCHEMAS[name]).write.format(
                "noop"
            ).mode("overwrite").save()
        scan_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        _gold_workload(wh, fmt).write.format("noop").mode("overwrite").save()
        query_sec = time.perf_counter() - t0

        size = sum(_dir_size(wh.path("bench", name, fmt)) for name in BENCH_TABLES)
        results.append(FormatTiming(fmt, round(write_sec, 3), round(scan_sec, 3),
                                    round(query_sec, 3), size))
    for df in source.values():
        df.unpersist()
    return results


@dataclass
class CodecTiming:
    fmt: str
    codec: str
    write_sec: float
    scan_sec: float
    size_bytes: int


# codecs whose libraries ship with the stock Spark distribution; the
# probe below still guards each one (lzo/brotli need external libs,
# so they are not listed). 'none'/'uncompressed' is the IO-vs-CPU
# baseline every codec is traded against.
CODEC_MATRIX: dict[str, tuple[str, ...]] = {
    "parquet": ("uncompressed", "snappy", "gzip", "zstd", "lz4"),
    "orc": ("none", "snappy", "zlib", "zstd", "lz4"),
}


def run_codec_bench(
    spark: SparkSession,
    sf_dir: str,
    root: str,
    matrix: dict[str, tuple[str, ...]] | None = None,
) -> list[CodecTiming]:
    """The compression-codec axis of the format comparison: the same
    fact table (lineitem — the widest/biggest bench table) written and
    re-scanned once per (format, codec), reporting wall + bytes. This
    is the second dial the reference's format matrix exists to turn
    (its Iceberg table properties pin write.format + compression,
    dags/2_bronze_to_silver.py:245-258); the format axis alone
    conflates container layout with codec defaults (parquet=snappy vs
    orc=zlib), so the codec sweep separates them. Each combo is
    probe-guarded: a codec whose native library is missing records
    nothing rather than failing the bench."""
    import os

    matrix = matrix or CODEC_MATRIX
    fact = table(spark, sf_dir, "lineitem").cache()
    fact.count()
    results = []
    for fmt, codecs in matrix.items():
        for codec in codecs:
            out = os.path.join(root, f"codec_{fmt}_{codec}")
            try:
                t0 = time.perf_counter()
                fact.write.format(fmt).option("compression", codec).mode(
                    "overwrite"
                ).save(out)
                write_sec = time.perf_counter() - t0
                t0 = time.perf_counter()
                spark.read.format(fmt).schema(TESTDATA_SCHEMAS["lineitem"]).load(
                    out
                ).write.format("noop").mode("overwrite").save()
                scan_sec = time.perf_counter() - t0
            except Exception:  # noqa: BLE001 — missing native codec lib
                continue
            results.append(
                CodecTiming(fmt, codec, round(write_sec, 3), round(scan_sec, 3),
                            _dir_size(out))
            )
    fact.unpersist()
    return results


def main() -> None:
    import os
    import tempfile

    from .session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="format-bench")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="format_bench_") as root:
        results = run_format_bench(spark, sf_dir, root)
        codecs = run_codec_bench(spark, sf_dir, root)
    print(json.dumps({
        "formats": [asdict(r) for r in results],
        "codecs": [asdict(r) for r in codecs],
    }))


if __name__ == "__main__":
    main()
