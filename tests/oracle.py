"""Local mirror of the driver's correctness gate: run a Spark query
and its DuckDB oracle on the same parquet tables, compare row count,
schema (column names) and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb

from lakehouse_file_format_compare_spark.schemas import TESTDATA_TABLES

_EPS = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


def _canon_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_canon(row[i]) for i in order) for row in rows),
        key=lambda r: tuple((v is None, str(v)) for v in r),
    )


def compare(spark, sf_dir: str, fn, sql: str):
    """Returns (ok, message)."""
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = _canon_rows(spark_rows, spark_cols)
    d = _canon_rows(duck_rows, duck_cols)
    if s != d:
        diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
        return False, f"value mismatch; first diffs: {diff}"
    return True, f"ok ({len(spark_rows)} rows)"
