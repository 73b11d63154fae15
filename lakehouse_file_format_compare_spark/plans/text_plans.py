"""Text-analysis queries over the documents table (north-star
extension: language-ID, quality scoring, token counting, document
fingerprinting — BASELINE.json). Every query is a pure column-
expression plan (no UDFs) with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources.testdata import table

_PUNCT_DUCK = T.PUNCT_RE.replace("'", "''")


VOCAB_TOP_V = 25
BPE_TOP_K = 25


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics; widened in r9 with the
    tokenizer-TRAINING statistics (operators/vocab.py): vocab_*
    scalars fingerprint the top-V word vocabulary and bpe_* scalars
    the top-K BPE merge-pair counts (Sennrich step 1, counted over
    the distinct-word table weighted by frequency — the trainer's
    scale shape). Every widened value is exact in the oracle."""
    from ..operators.vocab import bpe_merge_candidates, word_vocabulary

    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    vocab = (
        word_vocabulary(docs, top_v=VOCAB_TOP_V)
        .withColumn("__rn", F.row_number().over(w))
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_terms"),
            F.max(F.when(F.col("__rn") == 1, F.col("word"))).alias("vocab_top_word"),
            F.max(F.when(F.col("__rn") == 1, F.col("n"))).cast("long").alias(
                "vocab_top_n"
            ),
            F.sum(F.col("__rn") * F.col("n")).cast("long").alias("vocab_fp"),
        )
    )
    wp = Window.orderBy(F.col("n").desc(), F.col("pair"))
    bpe = (
        bpe_merge_candidates(docs, top_k=BPE_TOP_K)
        .withColumn("__rn", F.row_number().over(wp))
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("pair"))).alias("bpe_top_pair"),
            F.max(F.when(F.col("__rn") == 1, F.col("n"))).cast("long").alias(
                "bpe_top_n"
            ),
            F.sum(F.col("__rn") * F.col("n")).cast("long").alias("bpe_fp"),
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.regexp_count(F.col("text"), F.lit(T.PUNCT_RE)).alias("n_punct"),
    ).crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(bpe))


TOKEN_STATS_SQL = f"""
WITH words AS (
    SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ) WHERE length(word) > 0
    GROUP BY word
), vtop AS (
    SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rn
    FROM words ORDER BY n DESC, word LIMIT {VOCAB_TOP_V}
), vagg AS (
    SELECT COUNT(*) AS vocab_terms,
           MAX(CASE WHEN rn = 1 THEN word END) AS vocab_top_word,
           MAX(CASE WHEN rn = 1 THEN n END) AS vocab_top_n,
           CAST(SUM(rn * n) AS BIGINT) AS vocab_fp
    FROM vtop
), bpairs AS (
    SELECT substr(word, i, 2) AS pair, CAST(SUM(n) AS BIGINT) AS n
    FROM words, LATERAL (
        SELECT unnest(generate_series(1, length(word) - 1)) AS i
    )
    WHERE length(word) >= 2
    GROUP BY 1
), btop AS (
    SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rn
    FROM bpairs ORDER BY n DESC, pair LIMIT {BPE_TOP_K}
), bagg AS (
    SELECT MAX(CASE WHEN rn = 1 THEN pair END) AS bpe_top_pair,
           MAX(CASE WHEN rn = 1 THEN n END) AS bpe_top_n,
           CAST(SUM(rn * n) AS BIGINT) AS bpe_fp
    FROM btop
)
SELECT doc_id,
       length(text) AS n_chars_actual,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '([A-Za-z]+|[0-9]|[^A-Za-z0-9\\s])')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '{_PUNCT_DUCK}')) AS n_punct,
       vocab_terms, vocab_top_word, vocab_top_n, vocab_fp,
       bpe_top_pair, bpe_top_n, bpe_fp
FROM documents, vagg, bagg
"""


def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        F.round(T.mean_word_len(F.col("text")), 6).alias("mean_word_len"),
        T.quality_score(F.col("text")).alias("quality_score"),
    )


_STOP_PATTERN = r"(?i)\b(" + "|".join(T.STOPWORDS) + r")\b"

QUALITY_SQL = f"""
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
    SELECT doc_id,
           CASE WHEN n = 0 THEN 0.0 ELSE puncts / CAST(n AS DOUBLE) END AS punct_ratio,
           CASE WHEN toks = 0 THEN 0.0 ELSE stops / CAST(toks AS DOUBLE) END AS stopword_ratio,
           CASE WHEN toks = 0 THEN 0.0 ELSE alpha_chars / CAST(toks AS DOUBLE) END AS mean_word_len,
           CAST(toks AS DOUBLE) AS toks_d
    FROM base
)
SELECT doc_id,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(0.4 * LEAST(toks_d / 50.0, 1.0)
           + 0.2 * (1.0 - LEAST(punct_ratio * 5.0, 1.0))
           + 0.2 * LEAST(stopword_ratio * 4.0, 1.0)
           + 0.2 * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1.0 ELSE 0.5 END), 4)
           AS quality_score
FROM ratios
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"hits_{lang}") for lang in T.LANG_MARKERS],
        T.lang_id(F.col("text")).alias("lang_pred"),
    )


def _duck_hits(lang: str) -> str:
    pattern = r"(?i)\b(" + "|".join(T.LANG_MARKERS[lang]) + r")\b"
    return f"len(regexp_extract_all(text, '{pattern}'))"


_LANG_CASE = " ".join(
    f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}'" for lang in T.LANG_MARKERS
)

LANG_ID_SQL = f"""
WITH scored AS (
    SELECT doc_id,
           {', '.join(f'{_duck_hits(lang)} AS hits_{lang}' for lang in T.LANG_MARKERS)}
    FROM documents
), best_of AS (
    SELECT *, GREATEST({', '.join(f'hits_{lang}' for lang in T.LANG_MARKERS)}) AS best FROM scored
)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in T.LANG_MARKERS)},
       CASE {_LANG_CASE} ELSE 'und' END AS lang_pred
FROM best_of
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


FINGERPRINTS_SQL = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


QUERIES = {
    "text_token_stats": token_stats,
    "text_quality": quality,
    "text_lang_id": lang_id,
    "text_fingerprints": fingerprints,
}

ORACLES = {
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality": QUALITY_SQL,
    "text_lang_id": LANG_ID_SQL,
    "text_fingerprints": FINGERPRINTS_SQL,
}
