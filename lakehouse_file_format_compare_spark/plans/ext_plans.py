"""Extension-surface queries: the ad-hoc SQL surface (S6/C3, README
Trino queries) and the multimodal binary-column pipeline.

``op_sql_surface`` / ``op_readme_customer_filter`` run through
``spark.sql`` over registered temp views — the engine's second query
API (SURVEY §3.4: one engine answers both). Their SQL text is written
in the dialect intersection so the DuckDB oracle executes the SAME
string.

``mm_image_features`` drives the mapInPandas multimodal plumbing
(ext/multimodal.py) with the deterministic fake decoder. Since round
3 it has a FULL value oracle: DuckDB's sha256() reproduces the
content hash, and the fake-decode dimensions (64 + digest_byte % 192)
are recovered from the hex digest with a strpos-based nibble parse —
so the whole mapInPandas path is hash-compared, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ext.multimodal import documents_as_media, extract_image_features
from ..functions.numeric import grid_sql
from ..sources.testdata import register_views, table

_VOLUME = grid_sql(f"SUM({grid_sql('l_extendedprice * (1 - l_discount)', 2)})", 2)

SQL_SURFACE = f"""
SELECT p_brand AS product_name, {_VOLUME} AS total_volume
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY total_volume DESC, product_name
"""

README_CUSTOMER_FILTER = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 9000
ORDER BY c_acctbal DESC, c_custkey
"""


def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_SURFACE)


def readme_customer_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(README_CUSTOMER_FILTER)


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return extract_image_features(documents_as_media(docs), fake_decode=True)


# The fake decoder derives width/height from the first two sha256
# digest bytes (ext/multimodal.py::_fake_decode); the hex digest's
# nibbles are parsed back to byte values in SQL (strpos is 1-based).
_NIBBLE = "strpos('0123456789abcdef', substr(content_sha256, {pos}, 1)) - 1"
_BYTE0 = f"16 * ({_NIBBLE.format(pos=1)}) + ({_NIBBLE.format(pos=2)})"
_BYTE1 = f"16 * ({_NIBBLE.format(pos=3)}) + ({_NIBBLE.format(pos=4)})"

MM_IMAGE_FEATURES_SQL = f"""
WITH feat AS (
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
)
SELECT media_id, n_bytes, content_sha256,
       64 + ({_BYTE0}) % 192 AS width,
       64 + ({_BYTE1}) % 192 AS height,
       3 AS channels
FROM feat
"""

# op_readme_customer_filter is NOT a driver row (the driver records
# exactly 50 entries; its slot went to dedup_components, which carries
# a full value oracle). It stays oracle-checked in
# tests/test_ext.py::test_readme_customer_filter_oracle — same compare,
# pytest-level.
QUERIES = {
    "op_sql_surface": sql_surface,
    "mm_image_features": mm_image_features,
}

ORACLES = {
    "op_sql_surface": SQL_SURFACE,
    "mm_image_features": MM_IMAGE_FEATURES_SQL,
}
