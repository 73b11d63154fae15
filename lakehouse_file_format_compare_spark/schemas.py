"""Explicit StructType registry — no schema inference anywhere.

The reference infers schemas twice (dict inference at generation,
``inferSchema=true`` at the CSV silver load — SURVEY §1.4,
dags/2_bronze_to_silver.py:183); that is its biggest correctness
hazard. This module pins every schema the engine touches:

1. TESTDATA — the driver's TPC-H-ish tables (TESTDATA.md).
2. FINTECH — the reference's 15-table Brazilian-fintech star schema
   (sql/model.md:1-111, dags/1_generate_bronze_batch.py), with the
   table-config registry (primary keys + mutability class) ported from
   dags/2_bronze_to_silver.py:70-161.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


# ---------------------------------------------------------------------------
# 1. TESTDATA tables (driver-generated parquet; TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType(), True), ("r_name", StringType(), True)),
    "nation": _st(
        ("n_nationkey", IntegerType(), True),
        ("n_name", StringType(), True),
        ("n_regionkey", IntegerType(), True),
    ),
    "customer": _st(
        ("c_custkey", LongType(), True),
        ("c_name", StringType(), True),
        ("c_nationkey", IntegerType(), True),
        ("c_acctbal", DoubleType(), True),
        ("c_mktsegment", StringType(), True),
    ),
    "supplier": _st(
        ("s_suppkey", LongType(), True),
        ("s_name", StringType(), True),
        ("s_nationkey", IntegerType(), True),
        ("s_acctbal", DoubleType(), True),
    ),
    "part": _st(
        ("p_partkey", LongType(), True),
        ("p_name", StringType(), True),
        ("p_brand", StringType(), True),
        ("p_type", StringType(), True),
        ("p_size", IntegerType(), True),
        ("p_retailprice", DoubleType(), True),
    ),
    "orders": _st(
        ("o_orderkey", LongType(), True),
        ("o_custkey", LongType(), True),
        ("o_orderstatus", StringType(), True),
        ("o_totalprice", DoubleType(), True),
        ("o_orderdate", TimestampType(), True),
        ("o_orderpriority", StringType(), True),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType(), True),
        ("l_partkey", LongType(), True),
        ("l_suppkey", LongType(), True),
        ("l_linenumber", IntegerType(), True),
        ("l_quantity", DoubleType(), True),
        ("l_extendedprice", DoubleType(), True),
        ("l_discount", DoubleType(), True),
        ("l_tax", DoubleType(), True),
        ("l_returnflag", StringType(), True),
        ("l_linestatus", StringType(), True),
        ("l_shipdate", TimestampType(), True),
    ),
    # ts is naive nanosecond-precision parquet, which Spark 4 refuses
    # to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Physical read
    # schema is LongType under spark.sql.legacy.parquet.nanosAsLong;
    # sources/testdata.py converts to TimestampType (micros).
    "events": _st(
        ("event_id", LongType(), True),
        ("ts", LongType(), True),
        ("user_id", LongType(), True),
        ("event_type", StringType(), True),
        ("value", DoubleType(), True),
        ("props", StringType(), True),
    ),
    "documents": _st(
        ("doc_id", LongType(), True),
        ("text", StringType(), True),
        ("lang", StringType(), True),
        ("source", StringType(), True),
        ("n_chars", LongType(), True),
    ),
    "embeddings": _st(
        ("vec_id", LongType(), True),
        ("embedding", ArrayType(FloatType()), True),
        ("label", IntegerType(), True),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# ---------------------------------------------------------------------------
# 2. FINTECH star schema (reference parity)
# ---------------------------------------------------------------------------

# Every generated table carries ingestion_timestamp, appended at
# generation time (dags/1_generate_bronze_batch.py:174 et al.).
_INGEST = ("ingestion_timestamp", TimestampType(), False)

FINTECH_SCHEMAS: dict[str, StructType] = {
    # static dims (sql/model.md:19-64; FIXTURES.md)
    "d_country": _st(
        ("country_id", LongType(), False),
        ("country_name", StringType(), True),
        _INGEST,
    ),
    "d_state": _st(
        ("state_id", LongType(), False),
        ("state_name", StringType(), True),
        ("country_id", LongType(), True),
        _INGEST,
    ),
    "d_city": _st(
        ("city_id", LongType(), False),
        ("city_name", StringType(), True),
        ("state_id", LongType(), True),
        _INGEST,
    ),
    "d_year": _st(
        ("year_id", IntegerType(), False),
        ("action_year", IntegerType(), True),
        _INGEST,
    ),
    "d_month": _st(
        ("month_id", IntegerType(), False),
        ("action_month", IntegerType(), True),
        ("month_name", StringType(), True),
        _INGEST,
    ),
    "d_week": _st(
        ("week_id", IntegerType(), False),
        ("action_week", IntegerType(), True),
        _INGEST,
    ),
    "d_weekday": _st(
        ("weekday_id", IntegerType(), False),
        ("action_weekday", StringType(), True),
        _INGEST,
    ),
    "d_time": _st(
        ("time_id", LongType(), False),
        ("full_timestamp", TimestampType(), True),
        ("year_id", IntegerType(), True),
        ("month_id", IntegerType(), True),
        ("week_id", IntegerType(), True),
        ("weekday_id", IntegerType(), True),
        _INGEST,
    ),
    "d_products": _st(
        ("product_id", IntegerType(), False),
        ("product_name", StringType(), True),
        ("product_category", StringType(), True),
        _INGEST,
    ),
    "d_transaction_types": _st(
        ("transaction_type_id", IntegerType(), False),
        ("transaction_type_name", StringType(), True),
        ("is_financial", BooleanType(), True),
        _INGEST,
    ),
    # mutable dims
    "d_customers": _st(
        ("customer_id", LongType(), False),
        ("first_name", StringType(), True),
        ("last_name", StringType(), True),
        _INGEST,
    ),
    "d_customer_identifiers": _st(
        ("identifier_id", LongType(), False),
        ("customer_id", LongType(), True),
        ("identifier_type", StringType(), True),
        ("identifier_value", StringType(), True),
        ("country_id", LongType(), True),
        _INGEST,
    ),
    # facts (sql/model.md:82-111)
    "f_contracts": _st(
        ("contract_id", LongType(), False),
        ("customer_id", LongType(), True),
        ("product_id", IntegerType(), True),
        ("contract_status", StringType(), True),
        ("start_date", TimestampType(), True),
        ("end_date", TimestampType(), True),
        _INGEST,
    ),
    "f_contract_attributes": _st(
        ("attribute_id", LongType(), False),
        ("contract_id", LongType(), True),
        ("attribute_name", StringType(), True),
        ("attribute_value", StringType(), True),
        ("valid_from", TimestampType(), True),
        ("valid_to", TimestampType(), True),
        _INGEST,
    ),
    "f_transactions": _st(
        ("transaction_id", LongType(), False),
        ("contract_id", LongType(), True),
        ("transaction_type_id", IntegerType(), True),
        ("requested_at_time_id", LongType(), True),
        ("completed_at_time_id", LongType(), True),
        ("transaction_status", StringType(), True),
        ("amount", DoubleType(), True),
        ("currency", StringType(), True),
        _INGEST,
    ),
}


@dataclass(frozen=True)
class TableConfig:
    """Mirrors the silver load registry (dags/2_bronze_to_silver.py:70-161):
    primary key columns + mutability class decide the merge policy
    (insert-only for static dims, upsert for mutable dims and facts —
    dispatch at dags/2_bronze_to_silver.py:266)."""

    name: str
    key_columns: tuple[str, ...]
    is_dimension: bool
    schema: StructType = field(repr=False, default=None)  # type: ignore[assignment]

    @property
    def is_static_dim(self) -> bool:
        return (
            self.is_dimension
            and self.name.startswith("d_")
            and self.name not in ("d_customers", "d_customer_identifiers")
        )

    @property
    def merge_policy(self) -> str:
        return "insert_only" if self.is_static_dim else "upsert"


FINTECH_TABLE_CONFIGS: dict[str, TableConfig] = {
    name: TableConfig(name, keys, is_dim, FINTECH_SCHEMAS[name])
    for name, keys, is_dim in [
        ("d_country", ("country_id",), True),
        ("d_state", ("state_id",), True),
        ("d_city", ("city_id",), True),
        ("d_year", ("year_id",), True),
        ("d_month", ("month_id",), True),
        ("d_week", ("week_id",), True),
        ("d_weekday", ("weekday_id",), True),
        ("d_time", ("time_id",), True),
        ("d_products", ("product_id",), True),
        ("d_transaction_types", ("transaction_type_id",), True),
        ("d_customers", ("customer_id",), True),
        ("d_customer_identifiers", ("identifier_id",), True),
        ("f_contracts", ("contract_id",), False),
        ("f_contract_attributes", ("attribute_id",), False),
        ("f_transactions", ("transaction_id",), False),
    ]
}
