from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.skew import salted_join
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    supp = table(spark, SF_SMOKE, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(supp, "l_suppkey").groupBy("l_suppkey").count()
    salted = salted_join(li, supp, "l_suppkey", salt_buckets=8).groupBy("l_suppkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    li = table(spark, SF_SMOKE, "lineitem").limit(100)
    # empty small side → every big row survives with nulls
    supp = (
        table(spark, SF_SMOKE, "supplier")
        .withColumnRenamed("s_suppkey", "l_suppkey")
        .where(F.lit(False))
    )
    out = salted_join(li, supp, "l_suppkey", how="left", salt_buckets=4)
    assert out.count() == 100
    assert out.where(F.col("s_name").isNull()).count() == 100


def test_salt_distributes_hot_key(spark):
    # one hot key: salting must spread it over multiple salt buckets
    hot = spark.range(10000).select(F.lit(1).cast("long").alias("k"), F.col("id"))
    dim = spark.range(1).select(F.lit(1).cast("long").alias("k"), F.lit("x").alias("v"))
    from lakehouse_file_format_compare_spark.operators import skew

    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns], F.lit(42)), F.lit(16))
    n_buckets = hot.withColumn("s", salt_col).select("s").distinct().count()
    assert n_buckets == 16
    out = skew.salted_join(hot, dim, "k", salt_buckets=16)
    assert out.count() == 10000


def test_asof_join_semantics(spark):
    from lakehouse_file_format_compare_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], "k long, t long, pname string"
    )
    right = spark.createDataFrame(
        [(1, 8, "v1"), (1, 15, "v2"), (1, 20, "v3"), (3, 1, "vx")],
        "k long, t long, vname string",
    )
    out = {r.pname: r.vname_asof for r in asof_join(
        left, right, key="k", left_ts="t", right_ts="t", right_cols=["vname"]
    ).collect()}
    assert out == {
        "p1": "v1",   # latest right at t<=10 is t=8
        "p2": "v3",   # equal timestamps: right row visible (backward incl.)
        "p3": None,   # no right rows for key 2
    }


def test_asof_join_carries_right_row_atomically(spark):
    """A right row with NULLs in SOME columns must be carried as-is:
    the output must never stitch together non-null values from
    DIFFERENT right rows (regression for the per-column
    last(ignorenulls) carry)."""
    from lakehouse_file_format_compare_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 30, "p1")], "k long, t long, pname string")
    right = spark.createDataFrame(
        [(1, 10, "a-old", 100), (1, 20, None, 200), (1, 25, "c-new", None)],
        "k long, t long, sval string, ival long",
    )
    row = asof_join(
        left, right, key="k", left_ts="t", right_ts="t", right_cols=["sval", "ival"]
    ).collect()[0]
    # latest right row at t<=30 is (25, "c-new", NULL) — ival must be
    # NULL, not 200 carried forward from the t=20 row
    assert row.sval_asof == "c-new"
    assert row.ival_asof is None


def test_asof_join_all_null_right_row_is_latest(spark):
    """A right row whose every carried column is NULL still counts as
    the most recent right row (it is a row, not an absence)."""
    from lakehouse_file_format_compare_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 30, "p1")], "k long, t long, pname string")
    right = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, None, None)], "k long, t long, sval string, ival long"
    )
    row = asof_join(
        left, right, key="k", left_ts="t", right_ts="t", right_cols=["sval", "ival"]
    ).collect()[0]
    assert row.sval_asof is None and row.ival_asof is None


def test_range_join_matches_theta_join(spark):
    import pyspark.sql.functions as F

    from lakehouse_file_format_compare_spark.operators.temporal import range_join
    from lakehouse_file_format_compare_spark.sources.testdata import table

    events = table(spark, SF_SMOKE, "events").select("event_id", "value")
    intervals = spark.createDataFrame(
        [("a", 0.0, 123.0), ("b", 90.0, 260.5), ("c", 260.5, 600.0)],
        "tier string, lo double, hi double",
    )  # overlapping + bucket-spanning intervals
    got = sorted(
        (r.event_id, r.tier)
        for r in range_join(events, intervals, "value", "lo", "hi", bucket_width=37.0).collect()
    )
    want = sorted(
        (r.event_id, r.tier)
        for r in events.join(
            intervals, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
        ).collect()
    )
    assert got == want and len(got) > 0
