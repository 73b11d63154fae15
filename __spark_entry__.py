"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gold query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
plus the training-data-pipeline extensions; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each. As of r5 all 50 registry entries
carry a full DuckDB oracle (fintech_gold_suite gained one via the
committed silver fixture in fixtures/fintech_silver/; approximate
operators expose earned contract columns the oracle pins, per the
recall-contract pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_file_format_compare_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: gold product_ranking (4-way join + group +
    double ROW_NUMBER ranking) on sf0.001."""
    from lakehouse_file_format_compare_spark.plans.gold import product_ranking

    return product_ranking(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
