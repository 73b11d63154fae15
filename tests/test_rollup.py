"""Continuous-aggregate (hypertable rollup) maintenance: folding a
delta must equal recomputing over the union."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.rollup import (
    fold_time_rollup,
    time_rollup,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def test_fold_equals_recompute(spark):
    events = table(spark, SF_SMOKE, "events")
    old = events.where(F.col("event_id") % 3 != 0)
    delta = events.where(F.col("event_id") % 3 == 0)
    folded = fold_time_rollup(time_rollup(old), delta)
    full = time_rollup(events)
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, full.collect()))


def test_fold_touches_only_delta_buckets(spark):
    events = table(spark, SF_SMOKE, "events")
    base = time_rollup(events)
    empty = events.where(F.lit(False))
    assert sorted(map(tuple, fold_time_rollup(base, empty).collect())) == sorted(
        map(tuple, base.collect())
    )
