"""Tokenizer-training statistics: word vocabulary and BPE merge-pair
counts (the first merge step of byte-pair-encoding training,
Sennrich et al. 2016 — "Neural Machine Translation of Rare Words
with Subword Units").

Scale shape (the real BPE trainer trick): pair statistics are NOT
counted over the corpus — they are counted over the DISTINCT-WORD
table weighted by word frequency. The corpus is touched exactly once
(word explode + count, one shuffle with map-side combine); the
character-pair explode then runs over the vocabulary, which is
orders of magnitude smaller than the corpus and grows
sub-linearly (Heaps' law). A trainer that explodes character pairs
straight off the corpus does |corpus tokens| × word-length work per
iteration; this does |vocab| × word-length.

Everything is built-in-function JVM work (split/explode/transform/
substring) — no Python in the path — and every output is exactly
replayable in DuckDB (string_split_regex/generate_series/substr),
so the operators carry value oracles, not just shape tests.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no text surface at all; extension surface in the text-analysis
category (SURVEY §2 extensions; functions/text.py has the
BPE-ish token COUNT — this is the training-statistics half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"\s+"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
        ).alias("word")
    ).where(F.length("word") > 0)


def word_vocabulary(
    docs: DataFrame, text_col: str = "text", top_v: int = 100
) -> DataFrame:
    """(word, n) for the ``top_v`` most frequent whitespace words,
    deterministic tie-break on the word. One corpus scan, one shuffle
    (map-side combine), TakeOrderedAndProject for the top-V — no
    global sort."""
    if top_v < 1:
        raise ValueError("top_v must be >= 1")
    return (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(top_v)
    )


def bpe_merge_candidates(
    docs: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """(pair, n) for the ``top_k`` most frequent adjacent character
    pairs across the corpus — exactly the statistic BPE training
    greedily merges on (iteration 1 of the algorithm; subsequent
    iterations re-run this over the merged symbol table). Counted
    over the distinct-word table weighted by word frequency, so the
    corpus-sized explode happens ONCE (for the word counts) and the
    quadratic-ish pair explode runs over the vocabulary only."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    wc = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wn"))
        .where(F.length("word") >= 2)
    )
    pairs = wc.select(
        "__wn",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1),"
                   " i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("__wn").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_k)
    )
