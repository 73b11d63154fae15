"""Benchmark decontamination: find training documents sharing long
word n-grams with an evaluation set (the standard 13-gram overlap
test from the GPT-3/PaLM appendices; n is a dial).

Asymmetric by design — the eval side is benchmark-sized (thousands of
rows), the corpus side is the 100 TB side. Plan shape: explode both
sides to distinct n-grams, hash-join on the n-gram, count matches per
(doc, eval) pair. The eval n-gram set is TINY, so it broadcasts: the
corpus is scanned once, never shuffled on document identity until the
per-pair count (whose input is only the matching grams). A corpus doc
with ANY hit is flagged; `decontaminate` drops flagged docs with a
left-anti join.

Reuses the same tokenize-lower-split convention as
functions/text.py / operators/ranking.py so the three surfaces agree
on token identity. Exact DuckDB oracle: tests/test_decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_set(docs: DataFrame, n: int, id_col: str, text_col: str, out_id: str) -> DataFrame:
    """(out_id, ngram) — DISTINCT word n-grams per document.

    The token array is pinned in its own projection before the gram
    transform consumes it: expressions referenced inside higher-order
    lambdas re-evaluate per element (no CSE inside lambdas), so an
    unstaged ``slice(toks, i, n)`` would re-split the whole document
    once per gram (measured ~5x on this op at sf0.1, PROFILE_r05.md).
    """
    staged = docs.select(
        F.col(id_col).alias(out_id),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(out_id, F.explode(grams).alias("ngram"))


def ngram_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, shared_ngrams): corpus x eval pairs sharing at
    least one word n-gram. The eval n-gram side is broadcast — the
    corpus side streams through one scan + one pair-count aggregate."""
    c = _ngram_set(corpus, n, id_col, text_col, "doc_id")
    e = _ngram_set(eval_docs, n, eval_id_col, eval_text_col, "eval_id")
    return (
        c.join(F.broadcast(e), "ngram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents with >= min_shared n-gram overlaps with
    ANY eval document (left-anti join on the flagged id set)."""
    flagged = (
        ngram_contamination(
            corpus, eval_docs, n, id_col, text_col, eval_id_col, eval_text_col
        )
        .groupBy("doc_id")
        .agg(F.sum("shared_ngrams").alias("total_shared"))
        .where(F.col("total_shared") >= min_shared)
        .select("doc_id")
    )
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
