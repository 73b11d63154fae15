"""Repetition signals for corpus quality filtering.

The duplicate-line and most-frequent-n-gram fractions from the
Gopher/MassiveText filter family (Rae et al. 2021, §A1.1): documents
dominated by repeated lines (boilerplate, navigation, SEO spam) or a
single repeated phrase are low-value training text.

Line-level signals are pure higher-order array expressions
(split → filter → array_distinct → aggregate) — codegen-side, no
shuffle, scan-bound at 100 TB. The top-n-gram fraction needs a
per-document group-max, expressed as explode → two-key groupBy →
window max — two shuffles keyed by doc_id, AQE-coalesced; at scale it
partitions by doc hash, never global. Everything has an exact DuckDB
oracle (tests/test_repetition.py) on fixtures with engineered
repetition plus the raw documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.length(l) > 0)


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that repeat an earlier line.
    0.0 for documents with <= 1 line."""
    lines = _lines(text)
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    return F.when(n > 0, F.round((n - nd) / n.cast("double"), 6)).otherwise(F.lit(0.0))


def duplicate_line_char_fraction(text: Column) -> Column:
    """Fraction of line characters belonging to repeated copies
    (distinct lines keep their first copy's chars)."""
    lines = _lines(text)
    chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    chars_d = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, l: acc + F.length(l)
    )
    return F.when(
        chars > 0, F.round((chars - chars_d) / chars.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def top_ngram_char_fraction(docs: DataFrame, n: int = 2, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Per-document: the most frequent word n-gram and the fraction of
    document characters its occurrences cover.

    Plan shape: explode n-grams → groupBy (doc, ngram) count →
    row_number window keyed by doc (count desc, ngram asc tie-break)
    → keep rank 1. Both shuffles hash on doc_id; no global ordering.
    Documents with < n tokens emit ngram = NULL, fraction 0.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars_doc"),
        F.explode_outer(grams).alias("ngram"),
    )
    counted = base.groupBy("doc_id", "n_chars_doc", "ngram").agg(
        F.count(F.lit(1)).alias("occurrences")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("ngram").isNull(),  # real grams beat the NULL placeholder
        F.col("occurrences").desc(),
        F.col("ngram"),
    )
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.col("ngram").alias("top_ngram"),
            F.when(F.col("ngram").isNull(), F.lit(0)).otherwise(
                F.col("occurrences")
            ).alias("occurrences"),
            F.when(
                F.col("ngram").isNotNull() & (F.col("n_chars_doc") > 0),
                F.round(
                    F.col("occurrences") * F.length("ngram")
                    / F.col("n_chars_doc").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("top_ngram_char_frac"),
        )
    )
