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

from pyspark.sql import Column, DataFrame
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

    Plan shape (r5 rewrite of the r4 profile's most expensive op): the
    group-max is per-DOCUMENT, so it never needed a shuffle at all —
    ``array_sort`` the gram array within the row, then a single
    run-length fold (``F.aggregate``) finds the longest run, which IS
    the most frequent gram. Tie-break matches the previous
    (occurrences desc, ngram asc) window exactly: the fold replaces
    the best only on a STRICTLY longer run, and in ascending sorted
    order the first run of a given length is the lexicographically
    smallest gram. Zero shuffles, zero UDFs — a 100 TB sweep is
    scan-bound and embarrassingly parallel (the r4 shape shuffled
    every distinct (doc, gram) pair twice; measured speedup in
    PROFILE_r05.md). O(g log g) per doc vs the hash-agg's O(g), paid
    row-locally with no exchange. Documents with < n tokens emit
    ngram = NULL, fraction 0.

    Materialization note (measured 20x at sf0.1): expressions
    referenced inside higher-order lambdas are RE-EVALUATED per
    element (no CSE inside lambdas), so the token array and the gram
    array are each pinned in their own projection before the next
    stage consumes them — otherwise ``slice(toks, i, n)`` re-splits
    the whole document once per gram.
    """
    toks_expr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars_doc"),
        toks_expr.alias("__toks"),
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("doc_id", "n_chars_doc", F.array_sort(grams).alias("__grams"))

    # run-length fold over the sorted gram array: acc = (best gram,
    # best count, current gram, current run length)
    init = F.struct(
        F.lit(None).cast("string").alias("bg"),
        F.lit(0).alias("bc"),
        F.lit(None).cast("string").alias("cg"),
        F.lit(0).alias("cc"),
    )

    def step(acc, g):
        run = F.when(acc["cg"] == g, acc["cc"] + 1).otherwise(F.lit(1))
        better = run > acc["bc"]
        return F.struct(
            F.when(better, g).otherwise(acc["bg"]).alias("bg"),
            F.when(better, run).otherwise(acc["bc"]).alias("bc"),
            g.alias("cg"),
            run.alias("cc"),
        )

    staged = staged.select(
        "doc_id", "n_chars_doc", F.aggregate(F.col("__grams"), init, step).alias("__top")
    )
    gram, occ = F.col("__top")["bg"], F.col("__top")["bc"]
    return staged.select(
        "doc_id",
        gram.alias("top_ngram"),
        occ.alias("occurrences"),
        F.when(
            gram.isNotNull() & (F.col("n_chars_doc") > 0),
            F.round(occ * F.length(gram) / F.col("n_chars_doc").cast("double"), 6),
        ).otherwise(F.lit(0.0)).alias("top_ngram_char_frac"),
    )
