"""Ad-hoc SQL surface (S6/C3 + the README Trino queries).

The reference serves ad-hoc SQL through Trino over the same tables
(README.md:238-261); this engine answers them directly in Spark SQL
over registered temp views — no second engine (SURVEY §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.testdata import register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run ad-hoc SQL over the testdata views (registers them first)."""
    register_views(spark, sf_dir)
    return spark.sql(query)


# The README's canonical ad-hoc queries (README.md:244-261), adapted
# to this engine's gold-analog tables: volume ranking + filtered scan.
README_VOLUME_RANKING = """
SELECT p_brand AS product_name, SUM(l_extendedprice * (1 - l_discount)) AS total_volume
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY total_volume DESC
"""

README_CUSTOMER_FILTER = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 9000
ORDER BY c_acctbal DESC
"""
