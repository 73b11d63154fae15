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
