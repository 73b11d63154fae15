"""Differential oracle tests (SURVEY §5 plan #1): every query with a
declared oracle must match DuckDB on the sf0.01 testdata — the same
check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.plans import all_oracles, all_queries

from .conftest import SF_CORRECTNESS
from .oracle import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    ok, msg = compare(spark, SF_CORRECTNESS, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
