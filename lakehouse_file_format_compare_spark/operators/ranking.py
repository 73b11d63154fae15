"""Lexical relevance ranking over the documents table: TF-IDF and
BM25 (Robertson/Spärck Jones; the Okapi BM25 formula as published).

The retrieval side of the corpus toolbox — near-dup finds what to
DROP, BM25 finds what to KEEP for a topic (targeted subcorpus
construction, eval-set mining, decontamination sweeps against a
benchmark's queries).

Plan shape (both functions): tokenize → explode → per-(doc, term) TF
→ join a term-stats dimension (document frequency) → per-doc score
sum. Two shuffles (term stats, score-sum by doc) plus one join keyed
by term. The term-stats side is VOCABULARY-sized, orders of magnitude
smaller than the corpus, so at 100 TB it broadcasts (hinted
explicitly) and the whole query stays a single corpus scan + one
doc-keyed aggregation. No UDFs anywhere — log/ln math is codegen'd.

Exact DuckDB oracle in tests/test_ranking.py (same tokenization, same
double math, 1e-6 grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import grid

TOKEN_SPLIT_RE = r"\s+"


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf, doc_len): one row per document x distinct
    term, with term frequency and document token length."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", F.size("toks").alias("doc_len"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Documents matching no term are omitted (a WHERE on the exploded
    side — at scale this prunes the score-sum shuffle to matching
    docs only). Term stats (df) and corpus stats (N, avg len) are
    tiny aggregates broadcast into the scoring join.
    """
    terms = [t.lower() for t in query_terms]
    dt = _doc_terms(docs, id_col, text_col)
    corpus_stats = dt.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        (F.sum("tf") / F.countDistinct("doc_id")).alias("avg_len"),
    )
    df_stats = (
        dt.where(F.col("term").isin(*terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    matched = (
        dt.where(F.col("term").isin(*terms))
        .join(F.broadcast(df_stats), "term")
        .crossJoin(F.broadcast(corpus_stats))
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.col("avg_len")))
    )
    return (
        matched.withColumn("term_score", idf * tf_norm)
        .groupBy("doc_id")
        .agg(
            grid(F.sum("term_score"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )


def tfidf_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Plain TF-IDF (ln-idf, raw tf) per document for the query bag —
    the simpler cousin kept for parity with classic pipelines."""
    terms = [t.lower() for t in query_terms]
    dt = _doc_terms(docs, id_col, text_col)
    n_docs = dt.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    df_stats = (
        dt.where(F.col("term").isin(*terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        dt.where(F.col("term").isin(*terms))
        .join(F.broadcast(df_stats), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("term_score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("doc_id")
        .agg(grid(F.sum("term_score"), 6).alias("tfidf"))
    )
