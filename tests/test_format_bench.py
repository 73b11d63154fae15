"""Format-comparison harness (format_bench.py) — the reference's core
purpose ("run the identical workload into all formats side by side",
reference README). Environment ships parquet/orc/csv/json; the
contracts here are format-count-agnostic so avro/delta/iceberg join
automatically if their jars ever appear:

- the harness produces a timing+size row per available format;
- the gold workload returns IDENTICAL results regardless of storage
  format (the property that makes a format comparison meaningful);
- round-tripping through each format preserves row counts and the
  fact table's revenue checksum.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.format_bench import (
    BENCH_TABLES,
    _gold_workload,
    run_format_bench,
)
from lakehouse_file_format_compare_spark.schemas import TESTDATA_SCHEMAS
from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.storage import Warehouse, available_formats

from .conftest import SF_SMOKE


def test_format_bench_rows_and_cross_format_equivalence(spark, tmp_path):
    formats = available_formats(spark)
    assert "parquet" in formats and "orc" in formats
    results = run_format_bench(spark, SF_SMOKE, str(tmp_path), formats=formats)
    assert [r.fmt for r in results] == list(formats)
    for r in results:
        assert r.write_sec > 0 and r.scan_sec > 0 and r.query_sec > 0
        assert r.size_bytes > 0

    # identical workload, identical answers — per stored format
    wh = Warehouse(spark, str(tmp_path))
    grids = []
    for fmt in formats:
        rows = sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in row)
            for row in _gold_workload(wh, fmt).collect()
        )
        grids.append((fmt, rows))
    base_fmt, base = grids[0]
    assert len(base) > 0
    for fmt, rows in grids[1:]:
        assert rows == base, f"{fmt} workload diverges from {base_fmt}"

    # round-trip conservation: counts + revenue checksum per format
    src = table(spark, SF_SMOKE, "lineitem")
    want_n = src.count()
    want_rev = src.agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("r")
    ).collect()[0]["r"]
    for fmt in formats:
        li = wh.read_table("bench", "lineitem", fmt, schema=TESTDATA_SCHEMAS["lineitem"])
        assert li.count() == want_n, fmt
        got = li.agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("r")
        ).collect()[0]["r"]
        assert got == want_rev, fmt
    assert set(BENCH_TABLES) == {"lineitem", "orders", "customer", "supplier", "part"}


def test_codec_bench_rows_and_conservation(spark, tmp_path):
    """The codec axis: every probed (format, codec) combo that records
    a row must have round-tripped the fact table losslessly, and the
    baseline 'no compression' row must be the largest for its format
    (the property that makes a codec comparison meaningful). Combo
    list is probe-dependent — missing native libs drop rows, never
    fail — but parquet+snappy (Spark's default) must always be
    present."""
    from lakehouse_file_format_compare_spark.format_bench import run_codec_bench

    results = run_codec_bench(spark, SF_SMOKE, str(tmp_path))
    by_combo = {(r.fmt, r.codec): r for r in results}
    assert ("parquet", "snappy") in by_combo
    for r in results:
        assert r.write_sec > 0 and r.scan_sec > 0 and r.size_bytes > 0

    src = table(spark, SF_SMOKE, "lineitem")
    want_n = src.count()
    import os

    for r in results:
        out = os.path.join(str(tmp_path), f"codec_{r.fmt}_{r.codec}")
        got = spark.read.format(r.fmt).schema(TESTDATA_SCHEMAS["lineitem"]).load(out)
        assert got.count() == want_n, (r.fmt, r.codec)

    for fmt, base_codec in (("parquet", "uncompressed"), ("orc", "none")):
        base = by_combo.get((fmt, base_codec))
        if base is None:
            continue
        for (f, c), r in by_combo.items():
            if f == fmt and c != base_codec:
                assert r.size_bytes < base.size_bytes, (f, c)
