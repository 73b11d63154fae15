"""Deduplication queries over the documents/embeddings tables
(north-star extension). Exact and n-gram-Jaccard have exact DuckDB
oracles; MinHash-LSH and SimHash use engine-internal hashing
(xxhash64) that DuckDB can't replicate, so they're declared without
oracles (driver records the weaker rows-only check) and are instead
cross-verified against the exact-Jaccard baseline in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup as D
from ..sources.testdata import table

JACCARD_THRESHOLD = 0.5
EMBED_THRESHOLD = 0.9


def exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(table(spark, sf_dir, "documents"))


EXACT_SQL = """
WITH fp AS (
    SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
), groups AS (
    SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size FROM fp GROUP BY fp
)
SELECT doc_id, canonical_id, group_size, fp.fp FROM fp JOIN groups USING (fp)
"""


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD)


# Shingle construction mirrors functions/text.py::word_shingles —
# distinct 3-word shingles of normalized text (1-based list indexing
# in DuckDB).
NGRAM_JACCARD_SQL = f"""
WITH toks AS (
    SELECT doc_id,
           string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t
    FROM documents
), shingles AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3 THEN
                list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                ELSE [] END AS sh
    FROM toks
), exploded AS (
    SELECT doc_id AS doc, unnest(sh) AS shingle FROM shingles
), sizes AS (
    SELECT doc, COUNT(*) AS sz FROM exploded GROUP BY doc
), common AS (
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
    FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor((common / CAST(sa.sz + sb.sz - common AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS jaccard
FROM common
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE common / CAST(sa.sz + sb.sz - common AS DOUBLE) >= {JACCARD_THRESHOLD}
"""


def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(table(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD)


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(table(spark, sf_dir, "documents"), max_hamming=3)


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dup_pairs(table(spark, sf_dir, "embeddings"), threshold=EMBED_THRESHOLD)


# cosine replicated as the exact sequential double fold used by
# functions/vectors.py (DuckDB's list_cosine_similarity accumulates in
# float32 → 1e-7 error, too coarse for hash matching)
EMBEDDING_NEAR_DUP_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor((list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))) * 1000000 + 0.5) / 1000000 AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor((list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) * sqrt(list_sum(list_transform(range(1, len(b.embedding)+1), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))) * 1000000 + 0.5) / 1000000 >= {EMBED_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": exact,
    "dedup_ngram_jaccard": ngram_jaccard,
    "dedup_minhash_lsh": minhash_lsh,
    "dedup_simhash": simhash,
    "dedup_embedding": embedding_near_dup,
}

# minhash_lsh / simhash intentionally absent → rows-only check.
ORACLES = {
    "dedup_exact": EXACT_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_embedding": EMBEDDING_NEAR_DUP_SQL,
}
