"""The committed fintech silver fixture (fixtures/fintech_silver/,
written by scripts/build_fintech_fixtures.py) must equal a fresh run
of the seeded generator + silver merge — this keeps the
fintech_gold_suite driver row (which reads the fixture on BOTH the
Spark and DuckDB sides) anchored to the live pipeline code."""

from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.plans.fintech_plans import (
    GOLD_INPUT_TABLES,
    _fixture_frames,
    _frames,
)


@pytest.fixture(scope="module")
def generated(spark):
    return _frames(spark)


@pytest.mark.parametrize("name", GOLD_INPUT_TABLES)
def test_fixture_matches_generator(spark, name, generated):
    fixture = _fixture_frames(spark)[name]
    gen = generated[name]
    assert fixture.columns == gen.columns, name

    def canon(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(round(v, 9) if isinstance(v, float) else v for v in (r[c] for c in cols))
            for r in df.collect()
        )

    assert canon(fixture) == canon(gen), f"{name}: fixture drifted from generator output; rerun scripts/build_fintech_fixtures.py"
