"""Driver-visible summary row for the composed corpus pipeline
(ext/corpus.py: quality gate → exact + near dedup → canonicalize →
hash split → sequence packing).

The pipeline's tail stages use engine-internal xxhash64 (MinHash
bands, split buckets), so a full value oracle is impossible — instead
this follows the repo's recall-contract pattern (dedup_plans.py):
the Spark side emits per-split contract booleans it must EARN, plus
one DuckDB-replicable value column (the quality-gate survivor count,
pure column math on both engines) that anchors the row to real data.
A broken gate shifts n_gated; a broken/correlated splitter (the r3
ADVICE bug put 100% of a downweighted mix in 'train') breaks
ratio_ok; a broken packing window breaks packs_ok.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext.corpus import CorpusConfig, build_corpus, quality_gate
from ..operators.packing import pack_summary
from ..sources.testdata import table
from .text_plans import _PUNCT_DUCK, _STOP_PATTERN

RATIO_TOL = 0.05  # measured |ratio - weight| <= 0.008 at sf0.01/sf0.1


def corpus_build_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per split: earned contract booleans + the replicable
    gate count. All heavy work is the corpus pipeline itself; the
    summary adds two 3-row aggregates."""
    cfg = CorpusConfig()
    docs = table(spark, sf_dir, "documents")
    corpus = build_corpus(docs, cfg)

    per_split = corpus.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )
    max_pack = pack_summary(corpus, partition_cols=("split",)).groupBy("split").agg(
        F.max("pack_tokens").alias("max_pack_tokens")
    )
    n_gated = quality_gate(docs, cfg).agg(F.count(F.lit(1)).alias("n_gated"))

    weight = None
    for name, w in cfg.splits.items():
        cond = F.col("split") == name
        weight = F.when(cond, w) if weight is None else weight.when(cond, w)

    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        per_split.join(max_pack, "split")
        .crossJoin(n_gated)
        .select(
            "split",
            "n_gated",
            (F.col("n_docs") > 0).alias("nonempty_ok"),
            (
                F.abs(F.col("n_docs") / total - weight) < F.lit(RATIO_TOL)
            ).alias("ratio_ok"),
            # document-atomic packing: a pack overflows by at most one
            # document (packing.py bin-chunking contract)
            (
                F.col("max_pack_tokens")
                < F.lit(cfg.pack_budget_tokens) + F.col("max_doc_tokens")
            ).alias("packs_ok"),
        )
    )


# Oracle: replicate the quality gate (identical expression to
# text_plans.QUALITY_SQL at threshold/length bounds from CorpusConfig)
# and pin the contract booleans the Spark side must earn.
_CFG = CorpusConfig()

CORPUS_BUILD_SUMMARY_SQL = f"""
WITH base AS (
    SELECT doc_id,
           length(text) AS n,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS toks,
           len(regexp_extract_all(text, '{_PUNCT_DUCK}')) AS puncts,
           len(regexp_extract_all(text, '{_STOP_PATTERN}')) AS stops,
           length(regexp_replace(text, '\\s+', '', 'g')) AS alpha_chars
    FROM documents
), ratios AS (
    SELECT doc_id, n,
           CASE WHEN n = 0 THEN 0.0 ELSE puncts / CAST(n AS DOUBLE) END AS punct_ratio,
           CASE WHEN toks = 0 THEN 0.0 ELSE stops / CAST(toks AS DOUBLE) END AS stopword_ratio,
           CASE WHEN toks = 0 THEN 0.0 ELSE alpha_chars / CAST(toks AS DOUBLE) END AS mean_word_len,
           CAST(toks AS DOUBLE) AS toks_d
    FROM base
), scored AS (
    SELECT doc_id, n,
           ROUND(0.4 * LEAST(toks_d / 50.0, 1.0)
               + 0.2 * (1.0 - LEAST(punct_ratio * 5.0, 1.0))
               + 0.2 * LEAST(stopword_ratio * 4.0, 1.0)
               + 0.2 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1.0 ELSE 0.5 END), 4)
               AS quality_score
    FROM ratios
), gated AS (
    SELECT COUNT(*) AS n_gated FROM scored
    WHERE n BETWEEN {_CFG.min_chars} AND {_CFG.max_chars}
      AND quality_score >= {_CFG.min_quality}
)
SELECT s.split, g.n_gated,
       true AS nonempty_ok, true AS ratio_ok, true AS packs_ok
FROM (VALUES ('train'), ('val'), ('test')) s(split), gated g
"""


QUERIES = {"corpus_build_summary": corpus_build_summary}
ORACLES = {"corpus_build_summary": CORPUS_BUILD_SUMMARY_SQL}
