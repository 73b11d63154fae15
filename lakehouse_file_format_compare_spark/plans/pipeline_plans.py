"""End-to-end training-corpus build pipeline (r11 verdict #4).

The engine's corpus stages have been driver-checked as PARTS since
r5-r11; this row is the INTEGRATION proof that they compose as one
lineage without re-reading the corpus per stage:

    clean (functions/text.py::clean_text)
    -> exact dedup            (operators/dedup.py::exact_duplicates)
    -> fuzzy n-gram dedup     (operators/dedup.py::ngram_jaccard_pairs)
    -> bigram-LM filter       (operators/lm.py, CCNet-style)
    -> n-gram decontamination (operators/decontaminate.py)
    -> leakage-safe split     (operators/sampling.py::leakage_safe_splits)
    -> sequence packing       (operators/packing.py::pack_sequences)
    -> datasheet sections     (ext/datasheet.py::_tall)

Output: one tall frame (stage, n_docs, n_tokens, n_packs, fp) — an
exact doc/token count and membership fingerprint per stage, per-split
manifest rows with pack counts, a pack mass-conservation row (total
pack tokens must equal the post-decontamination token count), and a
datasheet fingerprint over the volume / lang_mix / duplication
sections of the final corpus (the full datasheet stays pytest-pinned
in tests/test_datasheet.py — its quality/evaluation sections re-train
the LM and would double this oracle).

The DuckDB oracle replays the ENTIRE chain from scratch — cleaning
regexes, md5 exact-dedup fingerprints, the shingle inverted-index
Jaccard joins at both thresholds, the add-k bigram LM train + score +
flag, the 8-gram contamination join, the recursive-CTE component
closure + md5-prefix split assignment, the packing window, and the
datasheet fold — so every stage's count, not just the final one, is
value-hashed at the driver.

Scale notes (100 TB): every stage is the already-audited operator —
shingle inverted-index joins are the sf-bounded EXACT tier (the
MinHash/PPJoin tiers are the scale path, driver rows 28/29), the LM
is one corpus explode + model-bounded joins, decontamination
broadcasts the eval side, split assignment is an O(log n) component
pass + a hash projection, packing is one per-(split, salt) window.
Stage frames are cut with lazy localCheckpoints so the corpus text is
scanned once per stage transition, never once per consumer.

Reference: the reference pipeline (dags/2_bronze_to_silver.py,
3_silver_to_gold.py) chains bronze->silver->gold the same way; this
row is its LLM-data analog over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext.datasheet import _tall
from ..functions import text as T
from ..operators.decontaminate import ngram_contamination
from ..operators.dedup import exact_duplicates, ngram_jaccard_pairs
from ..operators.lm import (
    THETA_NANOS,
    bigram_lm_score,
    bigram_lm_train,
    flag_high_perplexity,
)
from ..operators.packing import pack_sequences, pack_summary
from ..operators.sampling import leakage_safe_splits
from ..sources.testdata import table

CP_K = 3                 # shingle width (the dedup_ngram_jaccard convention)
CP_DEDUP_J = 0.5         # dedup threshold (dedup_plans.JACCARD_THRESHOLD)
CP_SPLIT_J = 0.35        # split-guard threshold: weaker links than the
#                          dedup cut (which removed every >=0.5 pair, so
#                          the 0.35-0.5 band is what leakage-safe
#                          splitting still has to fence)
CP_DECON_N = 8           # contamination gram width (hygiene DECON_N)
CP_EVAL_DOCS = 25        # eval fixture: first 25 cleaned docs by id
CP_BUDGET = 512          # pack token budget (tests/test_sampling BUDGET)
CP_GROUPS = 4            # pack salt groups (parallel layout)
CP_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_FP_MOD = 97
_PACK_FP_MOD = 100_003
_DS_MOD = 9_973
_DS_VAL_MOD = 1_000_003
_PACK_STRIDE = 1 << 40


def _doc_tokens() -> F.Column:
    """Whitespace token count, NULL-safe (functions/text.token_count
    with an explicit NULL guard so the stage sums never see size(NULL))."""
    return (
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(T.token_count(F.col("text")))
        .cast("long")
    )


def _stage_agg(df: DataFrame, stage: str) -> DataFrame:
    """One (stage, n_docs, n_tokens, 0, fp) row; fp folds membership
    AND per-doc token counts so any doc moving stages or changing
    length is visible in the driver hash."""
    per = df.select(
        F.pmod(F.col("doc_id"), F.lit(_FP_MOD)).alias("__m"),
        _doc_tokens().alias("__nt"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("__nt"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.col("__m") * (F.col("__nt") + 1)), F.lit(0))
        .cast("long")
        .alias("fp"),
    ).select(
        F.lit(stage).alias("stage"),
        "n_docs",
        "n_tokens",
        F.lit(0).cast("long").alias("n_packs"),
        "fp",
    )


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    # stage 1: crawl cleaning; docs that clean to nothing exit here
    s1 = (
        docs.select("doc_id", "lang", T.clean_text(F.col("text")).alias("text"))
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .localCheckpoint(eager=False)
    )
    # stage 2: exact dedup — keep the canonical (min-id) doc per
    # normalized-text md5 fingerprint. r14 (guide §2.4): the survivor
    # predicate is the window itself (doc_id == min(doc_id) over the
    # fingerprint partition — the exact_duplicates arithmetic inline),
    # so stage 2 is ONE pass over s1 with one exchange; the former
    # exact_duplicates + left-semi join read the s1 checkpoint twice
    # and paid the join's second exchange for identical rows.
    s2 = (
        s1.withColumn(
            "__min",
            F.min("doc_id").over(
                Window.partitionBy(T.fingerprint(F.col("text")))
            ),
        )
        .where(F.col("doc_id") == F.col("__min"))
        .drop("__min")
        .localCheckpoint(eager=False)
    )
    # stage 3: fuzzy dedup — drop every doc Jaccard-linked (>= 0.5) to
    # a smaller-id survivor (the incremental-dedup drop rule).
    # ONE shingle self-join serves BOTH thresholds: pairs at the lower
    # split threshold are computed once, the dedup stage filters
    # >= CP_DEDUP_J (grid-snapped jaccard ≥ t is exact at 6 decimals
    # for these thresholds), and stage 6 reuses the same frame
    # restricted to survivors — pair jaccard depends only on texts,
    # so pairs(s5, t) == pairs(s2, t) with both endpoints in s5.
    pairs_all = ngram_jaccard_pairs(
        s2, threshold=CP_SPLIT_J, k=CP_K
    ).localCheckpoint(eager=False)
    s3 = s2.join(
        pairs_all.where(F.col("jaccard") >= CP_DEDUP_J)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct(),
        "doc_id",
        "left_anti",
    ).localCheckpoint(eager=False)
    # stage 4: CCNet-style LM filter — train on the en slice of the
    # deduped corpus, drop the high-perplexity tail
    model, ctx_totals, vocab = bigram_lm_train(s3.where(F.col("lang") == "en"))
    scored = flag_high_perplexity(
        bigram_lm_score(s3, model, ctx_totals, vocab), THETA_NANOS
    )
    s4 = s3.join(
        scored.where(~F.col("flagged")).select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint(eager=False)
    # stage 5: decontamination — drop docs sharing any 8-gram with the
    # eval fixture (first CP_EVAL_DOCS cleaned docs; eval members that
    # survived this far drop themselves, as a train build must)
    eval_docs = s1.orderBy("doc_id").limit(CP_EVAL_DOCS).select("doc_id", "text")
    contaminated = (
        ngram_contamination(s4, eval_docs, n=CP_DECON_N)
        .select("doc_id")
        .distinct()
    )
    s5 = s4.join(contaminated, "doc_id", "left_anti").localCheckpoint(eager=False)
    # stage 6: leakage-safe split — components over the REMAINING
    # near-dup band (0.35 <= J < 0.5 survived dedup) so no linked docs
    # straddle train/val/test; md5-portable buckets for the oracle.
    # Reuses the stage-3 pair frame restricted to survivors (both
    # endpoints alive) — no second shingle explode/self-join.
    s5_ids = s5.select("doc_id")
    split_pairs = (
        pairs_all.join(
            s5_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
        )
        .join(s5_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
        .select("doc_a", "doc_b")
    )
    # r14 (guide §5): no lineage cut here — ``assigned`` has exactly
    # one consumer (the packing projection below), so a checkpoint
    # bought a materialization barrier and bought back nothing
    assigned = leakage_safe_splits(s5, split_pairs, CP_WEIGHTS, portable=True)
    # stage 7: per-split sequence packing
    with_nt = assigned.select("doc_id", "split", _doc_tokens().alias("n_tokens"))
    packed = pack_sequences(
        with_nt,
        budget=CP_BUDGET,
        groups=CP_GROUPS,
        partition_cols=("split",),
    ).localCheckpoint(eager=False)
    split_rows = (
        packed.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.count_distinct("pack_id").cast("long").alias("n_packs"),
            F.coalesce(
                F.sum(
                    F.pmod(F.col("doc_id"), F.lit(_FP_MOD))
                    * (F.col("n_tokens") + 1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("fp"),
        )
        .select(
            F.concat(F.lit("06_split:"), F.col("split")).alias("stage"),
            "n_docs",
            "n_tokens",
            "n_packs",
            "fp",
        )
    )
    ps = pack_summary(packed, partition_cols=("split",)).select(
        F.col("n_docs").alias("__pd"), "pack_tokens", "pack_id"
    )
    pack_row = ps.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        # mass conservation: total pack tokens == stage-5 token count
        F.coalesce(F.sum("pack_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.max("__pd"), F.lit(0)).cast("long").alias("n_packs"),
        F.coalesce(
            F.sum(
                F.pmod(F.col("pack_id"), F.lit(_PACK_FP_MOD))
                * F.col("pack_tokens")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("fp"),
    ).select(F.lit("07_pack").alias("stage"), "n_docs", "n_tokens", "n_packs", "fp")
    # stage 8: datasheet (cheap sections) over the final corpus — the
    # real _tall unpivot; duplication metrics are EARNED zeros (the
    # pipeline's own dedup upstream)
    volume = s5.agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.coalesce(F.sum(_doc_tokens()), F.lit(0)).cast("long").alias("tokens"),
        F.coalesce(F.sum(F.length("text")), F.lit(0)).cast("long").alias("chars"),
    )
    lang_tall = (
        s5.groupBy(F.col("lang").alias("metric"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(
            F.lit("lang_mix").alias("section"),
            F.coalesce(F.col("metric"), F.lit("<null>")).alias("metric"),
            "value",
        )
    )
    dupg = exact_duplicates(s5).where(F.col("group_size") > 1)
    dup_frame = dupg.agg(
        F.count_distinct("fp").cast("long").alias("dup_groups"),
        F.count(F.lit(1)).cast("long").alias("dup_docs"),
    )
    tall = (
        _tall(volume, "volume")
        .unionByName(lang_tall)
        .unionByName(_tall(dup_frame, "duplication"))
    )
    ds_key = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", "section", "metric")), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(_DS_MOD),
    )
    ds_row = tall.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(
            F.sum(ds_key * F.pmod(F.col("value"), F.lit(_DS_VAL_MOD))), F.lit(0)
        )
        .cast("long")
        .alias("fp"),
    ).select(
        F.lit("08_datasheet").alias("stage"),
        "n_docs",
        F.lit(0).cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_packs"),
        "fp",
    )
    return (
        _stage_agg(docs, "00_raw")
        .unionByName(_stage_agg(s1, "01_clean"))
        .unionByName(_stage_agg(s2, "02_exact_dedup"))
        .unionByName(_stage_agg(s3, "03_fuzzy_dedup"))
        .unionByName(_stage_agg(s4, "04_lm_filter"))
        .unionByName(_stage_agg(s5, "05_decontaminate"))
        .unionByName(split_rows)
        .unionByName(pack_row)
        .unionByName(ds_row)
    )


def _shingle_ctes(prefix: str, src: str, threshold: float) -> str:
    """Shingle inverted-index Jaccard pair CTEs over ``src`` (which
    must expose doc_id, text) — the COMPONENTS_SQL replay, k=3."""
    return f"""{prefix}_toks AS MATERIALIZED (
    SELECT doc_id,
           string_split_regex(lower(regexp_replace(trim(text), '__WS__', ' ', 'g')), '__WS__') AS t
    FROM {src}
), {prefix}_sh AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN len(t) >= {CP_K} THEN
                list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                ELSE [] END AS sh
    FROM {prefix}_toks
), {prefix}_ex AS MATERIALIZED (
    SELECT doc_id AS doc, unnest(sh) AS shingle FROM {prefix}_sh
), {prefix}_sz AS MATERIALIZED (
    SELECT doc, COUNT(*) AS sz FROM {prefix}_ex GROUP BY doc
), {prefix}_cm AS MATERIALIZED (
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
    FROM {prefix}_ex a JOIN {prefix}_ex b
      ON a.shingle = b.shingle AND a.doc < b.doc
    GROUP BY 1, 2
), {prefix}_pairs AS MATERIALIZED (
    SELECT doc_a, doc_b
    FROM {prefix}_cm
    JOIN {prefix}_sz sa ON sa.doc = doc_a
    JOIN {prefix}_sz sb ON sb.doc = doc_b
    WHERE common / CAST(sa.sz + sb.sz - common AS DOUBLE) >= {threshold}
)"""


def _gram_ctes(prefix: str, src: str, id_alias: str) -> str:
    """Distinct word {CP_DECON_N}-gram CTE over ``src`` (doc_id, text)
    — operators/decontaminate._ngram_set replay (docs shorter than n
    contribute nothing)."""
    n = CP_DECON_N
    return f"""{prefix}_t AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '__WS__'),
                       w -> length(w) > 0) AS t
    FROM {src}
), {prefix}_g AS MATERIALIZED (
    SELECT doc_id AS {id_alias}, unnest(
        CASE WHEN len(t) >= {n} THEN
             list_distinct(list_transform(range(1, len(t) - {n - 2}),
                                          i -> array_to_string(t[i:i+{n - 1}], ' ')))
             ELSE [] END) AS g
    FROM {prefix}_t
)"""


def _nt_sql(col: str = "text") -> str:
    """functions/text.token_count replay (NULL-safe)."""
    return (
        f"CASE WHEN {col} IS NULL OR length(trim({col})) = 0 THEN 0 "
        f"ELSE len(string_split_regex(trim({col}), '__WS__')) END"
    )


def _stage_row_sql(stage: str, src: str) -> str:
    return f"""SELECT '{stage}' AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS n_tokens,
       CAST(0 AS BIGINT) AS n_packs,
       CAST(COALESCE(SUM((doc_id % {_FP_MOD}) * (nt + 1)), 0) AS BIGINT) AS fp
FROM (SELECT doc_id, {_nt_sql()} AS nt FROM {src})"""


def _cp_oracle_sql() -> str:
    from ..functions.text import CONTROL_CHAR_RE, HTML_ENTITY_RE, HTML_TAG_RE

    sql = f"""
WITH RECURSIVE raw AS (
    SELECT doc_id, lang, text FROM documents
), cleaned AS MATERIALIZED (
    SELECT doc_id, lang,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '__HTML_TAG__', ' ', 'g'),
                       '__HTML_ENTITY__', ' ', 'g'),
                   '__CTRL__', '', 'g'),
               '__WS__', ' ', 'g')) AS text
    FROM raw WHERE text IS NOT NULL
), s1 AS MATERIALIZED (
    SELECT * FROM cleaned WHERE length(text) > 0
), s1f AS MATERIALIZED (
    SELECT doc_id, lang, text,
           md5(lower(regexp_replace(trim(text), '__WS__', ' ', 'g'))) AS fp
    FROM s1
), keep2 AS MATERIALIZED (
    SELECT fp, MIN(doc_id) AS kid FROM s1f GROUP BY fp
), s2 AS MATERIALIZED (
    SELECT s1f.doc_id, lang, text
    FROM s1f JOIN keep2 ON s1f.fp = keep2.fp AND s1f.doc_id = keep2.kid
), {_shingle_ctes("dd", "s2", CP_DEDUP_J)}, s3 AS (
    SELECT * FROM s2
    WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM dd_pairs)
), lm_tok AS MATERIALIZED (
    SELECT doc_id, lang,
           list_filter(string_split_regex(lower(trim(text)), '__WS__'),
                       w -> length(w) > 0) AS ws
    FROM s3
), lm_big AS MATERIALIZED (
    SELECT doc_id, lang,
           CASE WHEN i = 1 THEN '<s>' ELSE ws[i-1] END AS ctx,
           ws[i] AS w
    FROM lm_tok, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
), lm_m AS MATERIALIZED (
    SELECT ctx, w, CAST(COUNT(*) AS BIGINT) AS c FROM lm_big
    WHERE lang = 'en' GROUP BY ctx, w
), lm_ctxt AS MATERIALIZED (
    SELECT ctx, CAST(SUM(c) AS BIGINT) AS cc FROM lm_m GROUP BY ctx
), lm_voc AS MATERIALIZED (
    SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM lm_m
), lm_terms AS MATERIALIZED (
    SELECT b.doc_id,
           CASE WHEN (COALESCE(lm_ctxt.cc, 0) + 0.5 * lm_voc.v) > 0
                THEN CAST(floor(ln((COALESCE(lm_m.c, 0) + 0.5) /
                              (COALESCE(lm_ctxt.cc, 0) + 0.5 * lm_voc.v))
                           * 1000000000 + 0.5) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS t
    FROM lm_big b
    LEFT JOIN lm_m ON b.ctx = lm_m.ctx AND b.w = lm_m.w
    LEFT JOIN lm_ctxt ON b.ctx = lm_ctxt.ctx
    CROSS JOIN lm_voc
), lm_pd AS MATERIALIZED (
    SELECT d.doc_id,
           CAST(COALESCE(COUNT(t.t), 0) AS BIGINT) AS nb,
           CAST(COALESCE(SUM(t.t), 0) AS BIGINT) AS lp
    FROM s3 d LEFT JOIN lm_terms t ON d.doc_id = t.doc_id
    GROUP BY d.doc_id
), s4 AS MATERIALIZED (
    SELECT s3.* FROM s3 JOIN lm_pd USING (doc_id)
    WHERE NOT (nb > 0 AND lp < -{THETA_NANOS} * nb)
), ev AS MATERIALIZED (
    SELECT doc_id, text FROM s1 ORDER BY doc_id LIMIT {CP_EVAL_DOCS}
), {_gram_ctes("cg", "s4", "doc_id")}, {_gram_ctes("eg", "ev", "eval_id")}, s5 AS (
    SELECT * FROM s4
    WHERE doc_id NOT IN (SELECT DISTINCT c.doc_id
                         FROM cg_g c JOIN eg_g e ON c.g = e.g)
), {_shingle_ctes("sp", "s5", CP_SPLIT_J)}, edges AS (
    SELECT doc_a AS u, doc_b AS v FROM sp_pairs
    UNION
    SELECT doc_b, doc_a FROM sp_pairs
), reach(node, r) AS (
    SELECT u, v FROM edges
    UNION
    SELECT u, u FROM edges
    UNION
    SELECT w.node, e.v FROM reach w JOIN edges e ON w.r = e.u
), comp AS MATERIALIZED (
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
), assigned AS MATERIALIZED (
    SELECT d.doc_id, d.lang, d.text,
           CASE WHEN b < {int(round(CP_WEIGHTS["train"] * 10000))} THEN 'train'
                WHEN b < {int(round((CP_WEIGHTS["train"] + CP_WEIGHTS["val"]) * 10000))} THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT s5.*,
               CAST(('0x' || substr(md5('leak_split' || chr(31)
                    || CAST(COALESCE(c.component, s5.doc_id) AS VARCHAR)
                    || chr(31) || '42'), 1, 8)) AS BIGINT) % 10000 AS b
        FROM s5 LEFT JOIN comp c ON s5.doc_id = c.node
    ) d
), pk AS MATERIALIZED (
    SELECT split, doc_id, nt,
           (doc_id % {CP_GROUPS}) * {_PACK_STRIDE}
           + CAST(floor((SUM(nt) OVER (
                 PARTITION BY split, doc_id % {CP_GROUPS} ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - nt) / {CP_BUDGET}.0) AS BIGINT) AS pack_id
    FROM (SELECT split, doc_id, {_nt_sql()} AS nt FROM assigned)
), psum AS MATERIALIZED (
    SELECT split, pack_id, COUNT(*) AS pd, SUM(nt) AS ptok
    FROM pk GROUP BY 1, 2
), ds AS MATERIALIZED (
    SELECT 'volume' AS section, 'docs' AS metric,
           CAST(COUNT(*) AS BIGINT) AS value FROM s5
    UNION ALL
    SELECT 'volume', 'tokens',
           CAST(COALESCE(SUM({_nt_sql()}), 0) AS BIGINT) FROM s5
    UNION ALL
    SELECT 'volume', 'chars',
           CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) FROM s5
    UNION ALL
    SELECT 'lang_mix', COALESCE(lang, '<null>'),
           CAST(COUNT(*) AS BIGINT) FROM s5 GROUP BY 2
    UNION ALL
    SELECT 'duplication', 'dup_groups',
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT md5(lower(regexp_replace(trim(text), '__WS__', ' ', 'g'))) AS f
          FROM s5 GROUP BY 1 HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'duplication', 'dup_docs',
           CAST(COALESCE(SUM(n), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n
          FROM (SELECT md5(lower(regexp_replace(trim(text), '__WS__', ' ', 'g'))) AS f
                FROM s5)
          GROUP BY f HAVING COUNT(*) > 1)
)
{_stage_row_sql("00_raw", "raw")}
UNION ALL
{_stage_row_sql("01_clean", "s1")}
UNION ALL
{_stage_row_sql("02_exact_dedup", "s2")}
UNION ALL
{_stage_row_sql("03_fuzzy_dedup", "s3")}
UNION ALL
{_stage_row_sql("04_lm_filter", "s4")}
UNION ALL
{_stage_row_sql("05_decontaminate", "s5")}
UNION ALL
SELECT '06_split:' || split AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(COALESCE(SUM((doc_id % {_FP_MOD}) * (nt + 1)), 0) AS BIGINT) AS fp
FROM pk GROUP BY split
UNION ALL
SELECT '07_pack',
       CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(ptok), 0) AS BIGINT),
       CAST(COALESCE(MAX(pd), 0) AS BIGINT),
       CAST(COALESCE(SUM((pack_id % {_PACK_FP_MOD}) * ptok), 0) AS BIGINT)
FROM psum
UNION ALL
SELECT '08_datasheet',
       CAST(COUNT(*) AS BIGINT),
       CAST(0 AS BIGINT),
       CAST(0 AS BIGINT),
       CAST(COALESCE(SUM(
           (CAST(('0x' || substr(md5(section || ':' || metric), 1, 8)) AS BIGINT)
            % {_DS_MOD}) * (value % {_DS_VAL_MOD})), 0) AS BIGINT)
FROM ds
"""
    return (
        sql.replace("__HTML_TAG__", HTML_TAG_RE)
        .replace("__HTML_ENTITY__", HTML_ENTITY_RE)
        .replace("__CTRL__", CONTROL_CHAR_RE)
        .replace("__WS__", r"\s+")
    )


CORPUS_PIPELINE_SQL = _cp_oracle_sql()

QUERIES = {"corpus_pipeline": corpus_pipeline}
ORACLES = {"corpus_pipeline": CORPUS_PIPELINE_SQL}
