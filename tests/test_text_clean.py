"""Cleaning transforms (functions/text.py): hand fixtures, DuckDB
replay equality on the real documents table (the same regex strings
run on both engines), idempotence, and null/empty safety."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.functions.text import (
    CONTROL_CHAR_RE,
    HTML_ENTITY_RE,
    HTML_TAG_RE,
    clean_text,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def test_clean_text_fixtures(spark):
    rows = [
        (1, "<p>Hello <b>world</b>!</p>", "Hello world !"),
        (2, "a&amp;b &#38; c", "a b c"),
        (3, "tabs\tand\nnewlines\r\n  collapse", "tabs and newlines collapse"),
        (4, "ctrl\x00chars\x1fgone", "ctrlcharsgone"),
        (5, "", ""),
        (6, None, None),
        (7, "<div class='x'>nested <span>tags</span></div>", "nested tags"),
        (8, "no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.cleaned
        for r in df.select("doc_id", clean_text(F.col("text")).alias("cleaned")).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_clean_text_is_idempotent(spark):
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        clean_text(
            F.concat(F.lit("<p>&nbsp;"), F.col("text"), F.lit("\x01</p>\n\n"))
        ).alias("once"),
    )
    twice = docs.select(
        "doc_id", "once", clean_text(F.col("once")).alias("twice")
    )
    assert twice.where(F.col("once") != F.col("twice")).count() == 0


def test_clean_text_matches_duckdb_replay(spark):
    """The identical regex strings produce identical cleaned text on
    both engines over the real corpus (wrapped in markup + controls)."""
    docs = table(spark, SF_SMOKE, "documents")
    got = {
        r.doc_id: r.cleaned
        for r in docs.select(
            "doc_id",
            clean_text(
                F.concat(F.lit("<h1>T</h1> &amp; "), F.col("text"), F.lit("\x02<br>"))
            ).alias("cleaned"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    sql = f"""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace('<h1>T</h1> &amp; ' || text || chr(2) || '<br>',
                                      '{HTML_TAG_RE}', ' ', 'g'),
                       '{HTML_ENTITY_RE}', ' ', 'g'),
                   '{CONTROL_CHAR_RE}', '', 'g'),
               '\\s+', ' ', 'g')) AS cleaned
    FROM documents
    """
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    con.close()
    assert got == want
