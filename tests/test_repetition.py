"""Repetition signals (functions/repetition.py): DuckDB value oracles
on an engineered-repetition fixture (non-vacuous: known duplicate
lines and dominant n-grams) plus the raw documents table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.functions.repetition import (
    duplicate_line_char_fraction,
    duplicate_line_fraction,
    top_ngram_char_fraction,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

DOCS = [
    (1, "unique one\nunique two\nunique three"),
    (2, "same line\nsame line\nsame line\nother"),
    (3, "buy now click here buy now click here buy now"),
    (4, "single"),
    (5, ""),
    (6, "a\n\na\nb"),                       # empty lines ignored
    (7, "tok"),                              # fewer tokens than n
]


@pytest.fixture(scope="module")
def rep_fixture(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("rep") / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d[0] for d in DOCS], type=pa.int64()),
            "text": pa.array([d[1] for d in DOCS], type=pa.string()),
        }),
        path,
    )
    return path


LINE_SQL = """
WITH lines AS (
    SELECT doc_id,
           list_filter(string_split(text, chr(10)), l -> length(l) > 0) AS ls
    FROM read_parquet('{path}')
), stats AS (
    SELECT doc_id,
           len(ls) AS n,
           len(list_distinct(ls)) AS nd,
           list_sum(list_transform(ls, l -> length(l))) AS chars,
           list_sum(list_transform(list_distinct(ls), l -> length(l))) AS chars_d
    FROM lines
)
SELECT doc_id,
       CASE WHEN n > 0 THEN ROUND((n - nd) / CAST(n AS DOUBLE), 6) ELSE 0.0 END AS dup_line_frac,
       CASE WHEN chars > 0 THEN ROUND((chars - chars_d) / CAST(chars AS DOUBLE), 6) ELSE 0.0 END AS dup_char_frac
FROM stats
"""

NGRAM_SQL = """
WITH toks AS (
    SELECT doc_id, length(text) AS n_chars_doc,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM read_parquet('{path}')
), grams AS (
    SELECT doc_id, n_chars_doc,
           CASE WHEN len(t) >= {n}
                THEN list_transform(range(1, len(t) - {n} + 2),
                                    i -> array_to_string(t[i:i+{n}-1], ' '))
                ELSE [] END AS gs
    FROM toks
), exploded AS (
    SELECT doc_id, n_chars_doc, unnest(gs) AS ngram FROM grams
), counted AS (
    SELECT doc_id, n_chars_doc, ngram, COUNT(*) AS occurrences
    FROM exploded GROUP BY ALL
), ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY occurrences DESC, ngram
    ) AS rn
    FROM counted
)
SELECT d.doc_id,
       r.ngram AS top_ngram,
       COALESCE(r.occurrences, 0) AS occurrences,
       CASE WHEN r.ngram IS NOT NULL AND d.n_chars_doc > 0
            THEN ROUND(r.occurrences * length(r.ngram) / CAST(d.n_chars_doc AS DOUBLE), 6)
            ELSE 0.0 END AS top_ngram_char_frac
FROM (SELECT doc_id, length(text) AS n_chars_doc FROM read_parquet('{path}')) d
LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
"""


def _line_out(spark, path):
    return spark.read.parquet(path).select(
        "doc_id",
        duplicate_line_fraction(F.col("text")).alias("dup_line_frac"),
        duplicate_line_char_fraction(F.col("text")).alias("dup_char_frac"),
    )


def test_line_fractions_oracle(spark, rep_fixture):
    got = sorted(map(tuple, _line_out(spark, rep_fixture).collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(LINE_SQL.format(path=rep_fixture)).fetchall()))
    con.close()
    assert got == want


def test_line_fractions_values(spark, rep_fixture):
    rows = {r["doc_id"]: r for r in _line_out(spark, rep_fixture).collect()}
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[2]["dup_line_frac"] == pytest.approx(0.5)      # 4 lines, 2 dups
    assert rows[2]["dup_char_frac"] > 0.5                      # dup lines are long
    assert rows[4]["dup_line_frac"] == 0.0
    assert rows[5]["dup_line_frac"] == 0.0                     # empty-safe
    assert rows[6]["dup_line_frac"] == pytest.approx(1 / 3)    # a,a,b


def test_top_ngram_oracle(spark, rep_fixture):
    for n in (2, 3):
        got = sorted(map(tuple, top_ngram_char_fraction(
            spark.read.parquet(rep_fixture), n=n).collect()))
        con = duckdb.connect()
        want = sorted(map(tuple, con.execute(
            NGRAM_SQL.format(path=rep_fixture, n=n)).fetchall()))
        con.close()
        assert got == want, f"n={n}"


def test_top_ngram_values(spark, rep_fixture):
    rows = {r["doc_id"]: r for r in top_ngram_char_fraction(
        spark.read.parquet(rep_fixture), n=2).collect()}
    assert rows[3]["top_ngram"] in ("buy now", "now click")    # tie broken asc
    assert rows[3]["occurrences"] == 3
    assert rows[3]["top_ngram_char_frac"] > 0.4                # spammy doc
    assert rows[7]["top_ngram"] is None and rows[7]["occurrences"] == 0
    assert rows[5]["top_ngram_char_frac"] == 0.0


@pytest.mark.scale
def test_repetition_over_documents_table_oracle(spark, tmp_path_factory):
    """Full-table cross-engine compare on real testdata (sf0.01)."""
    import os

    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    docs = table(spark, SF_CORRECTNESS, "documents")
    got = sorted(map(tuple, docs.select(
        "doc_id",
        duplicate_line_fraction(F.col("text")).alias("dup_line_frac"),
        duplicate_line_char_fraction(F.col("text")).alias("dup_char_frac"),
    ).collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(LINE_SQL.format(path=path)).fetchall()))
    con.close()
    assert got == want

    got_n = sorted(map(tuple, top_ngram_char_fraction(docs, n=3).collect()))
    con = duckdb.connect()
    want_n = sorted(map(tuple, con.execute(NGRAM_SQL.format(path=path, n=3)).fetchall()))
    con.close()
    assert got_n == want_n
