"""Catalog/DDL surface tests (C1-C6): managed tables in the built-in
spark_catalog, full-refresh drop+create, temp-view lifecycle."""

from __future__ import annotations

from lakehouse_file_format_compare_spark import catalog as C
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def test_managed_table_lifecycle(spark):
    C.ensure_database(spark, "gold_test")
    name = "gold_test.region_copy"
    C.drop_table(spark, name)
    assert not C.table_exists(spark, name)
    C.save_table(table(spark, SF_SMOKE, "region"), name)
    assert C.table_exists(spark, name)
    assert C.row_count(spark, name) == 5
    # full-refresh pattern: drop + recreate (3_…py:188)
    C.drop_table(spark, name)
    C.save_table(table(spark, SF_SMOKE, "nation"), name)
    assert C.row_count(spark, name) == 25
    C.drop_table(spark, name)


def test_temp_view_lifecycle(spark):
    C.register_temp_view(table(spark, SF_SMOKE, "region"), "v_region")
    assert spark.sql("SELECT COUNT(*) AS n FROM v_region").collect()[0]["n"] == 5
    C.drop_temp_view(spark, "v_region")
    assert not spark.catalog.tableExists("v_region")


def test_analyze_table_collects_stats(spark):
    C.ensure_database(spark, "stats_db")
    name = "stats_db.orders_s"
    C.drop_table(spark, name)
    C.save_table(table(spark, SF_SMOKE, "orders"), name)
    C.analyze_table(spark, name, columns=["o_custkey", "o_totalprice"])
    stats = C.table_stats(spark, name)["statistics"]
    assert stats is not None and "rows" in stats, f"no stats: {stats}"
    # column-level stats visible to the optimizer
    desc = spark.sql(f"DESCRIBE EXTENDED {name} o_custkey").collect()
    kv = {r["info_name"]: r["info_value"] for r in desc}
    assert kv.get("distinct_count") not in (None, "NULL")
    C.drop_table(spark, name)
