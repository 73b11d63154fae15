"""Extension-surface queries: the ad-hoc SQL surface (S6/C3, README
Trino queries) and the multimodal binary-column pipeline.

``op_sql_surface`` / ``op_readme_customer_filter`` run through
``spark.sql`` over registered temp views — the engine's second query
API (SURVEY §3.4: one engine answers both). Their SQL text is written
in the dialect intersection so the DuckDB oracle executes the SAME
string.

``mm_image_features`` (r6) drives the REAL stdlib header probe
(ext/multimodal.py::probe_image — PNG IHDR / BMP info header parsed
with ``struct``, no codec) through the distributed mapInPandas path
over a committed corpus of genuine image files
(fixtures/media_images.parquet: fully valid PNG RGB/RGBA, 24bpp BMP
and real-LZW GIF89a payloads, built by scripts/build_media_fixture.py
— the fintech silver fixture pattern, since media bytes don't scale
with the TPC-H sf). The DuckDB oracle independently RE-PARSES the same bytes — magic
detection plus big-endian (PNG) / little-endian (BMP) dimension and
channel fields recovered from ``hex(content)`` with nibble arithmetic
— so the row compares two independent header parsers over identical
real files. The payload sha256 can't be oracled in SQL (DuckDB's
sha256 is VARCHAR-only, and a BLOB→VARCHAR cast escapes bytes), so it
is value-tested against hashlib in tests/test_ext.py instead and
excluded from the driver row's columns.

The r3-r5 fake-decode variant (content-hash-seeded dimensions over
documents-as-media) is demoted to a pytest oracle
(tests/test_correctness.py::test_demoted_mm_fake_decode_oracle) —
kept because it exercises the no-payload fallback and scales with sf.
"""

from __future__ import annotations

import os

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


MEDIA_FIXTURE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures", "media_images.parquet")
)


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header-probe path (``fake_decode=False``): width/height/
    channels come from parsing actual PNG/BMP bytes executor-side. The
    sha256 column is computed but projected away here (SQL-oracle
    limitation above); tests/test_ext.py hash-checks it."""
    media = spark.read.parquet(MEDIA_FIXTURE)
    return extract_image_features(media, fake_decode=False).select(
        "media_id", "n_bytes", "width", "height", "channels"
    )


def mm_image_features_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic fake-decode variant (hash-seeded dimensions)
    over documents-as-media — the no-payload fallback, pytest-oracled."""
    docs = table(spark, sf_dir, "documents")
    return extract_image_features(documents_as_media(docs), fake_decode=True)


# --- oracle SQL: independent header re-parse from hex(content) -------------

def _hx_nib(pos: int) -> str:
    """0-15 value of 1-based hex char ``pos`` (DuckDB hex() is uppercase)."""
    return f"(strpos('0123456789ABCDEF', substr(hx, {pos}, 1)) - 1)"


def _hx_byte(i: int) -> str:
    """0-255 value of 1-based byte ``i`` of the blob."""
    return f"(16 * {_hx_nib(2 * i - 1)} + {_hx_nib(2 * i)})"


def _be32(first: int) -> str:
    return " + ".join(f"{_hx_byte(first + j)} * {256 ** (3 - j)}" for j in range(4))


def _le32(first: int) -> str:
    return " + ".join(f"{_hx_byte(first + j)} * {256 ** j}" for j in range(4))


def _le16(first: int) -> str:
    return f"({_hx_byte(first)} + {_hx_byte(first + 1)} * 256)"


# Byte layout (1-based): PNG sig 1-8, IHDR width 17-20 / height 21-24
# big-endian, color type 26. GIF sig 1-6 ('GIF87a'/'GIF89a'),
# logical-screen width 7-8 / height 9-10 little-endian, palette ->
# 1 stored channel. BMP 'BM' 1-2, info-header width 19-22 / height
# 23-26 little-endian signed (fixture heights positive), bit count
# 29-30. Same offsets the Spark-side probe reads
# (ext/multimodal.py:106-122).
_IS_PNG = "substr(hx, 1, 16) = '89504E470D0A1A0A'"
_IS_GIF = "substr(hx, 1, 8) = '47494638'"

MM_IMAGE_FEATURES_SQL = f"""
WITH hxed AS (
    SELECT media_id, octet_length(content) AS n_bytes, hex(content) AS hx
    FROM read_parquet('{MEDIA_FIXTURE}')
)
SELECT media_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN {_IS_PNG} THEN {_be32(17)}
                 WHEN {_IS_GIF} THEN {_le16(7)}
                 ELSE {_le32(19)} END AS INTEGER) AS width,
       CAST(CASE WHEN {_IS_PNG} THEN {_be32(21)}
                 WHEN {_IS_GIF} THEN {_le16(9)}
                 ELSE {_le32(23)} END AS INTEGER) AS height,
       CAST(CASE WHEN {_IS_PNG}
                 THEN (CASE {_hx_byte(26)} WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
                                           WHEN 4 THEN 2 WHEN 6 THEN 4 ELSE 3 END)
                 WHEN {_IS_GIF} THEN 1
                 ELSE greatest(1, CAST(floor({_le16(29)} / 8) AS INTEGER))
            END AS INTEGER) AS channels
FROM hxed
"""


# The fake decoder derives width/height from the first two sha256
# digest bytes (ext/multimodal.py::_fake_decode); the hex digest's
# nibbles are parsed back to byte values in SQL (strpos is 1-based).
_NIBBLE = "strpos('0123456789abcdef', substr(content_sha256, {pos}, 1)) - 1"
_BYTE0 = f"16 * ({_NIBBLE.format(pos=1)}) + ({_NIBBLE.format(pos=2)})"
_BYTE1 = f"16 * ({_NIBBLE.format(pos=3)}) + ({_NIBBLE.format(pos=4)})"

MM_IMAGE_FEATURES_FAKE_SQL = f"""
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
