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
from ..functions.numeric import grid, grid_sql
from ..operators.importance import importance_resample
from ..operators.packing import pack_summary
from ..operators.pagerank import UNIT, pagerank
from ..sources.testdata import table
from .text_plans import _PUNCT_DUCK, _STOP_PATTERN

RATIO_TOL = 0.05  # measured |ratio - weight| <= 0.008 at sf0.01/sf0.1

# DSIR importance resampling (r7, operators/importance.py): docs with
# doc_id % DSIR_MARK_MOD == 0 get a 6-token domain suffix; the target
# exemplar sample is the %DSIR_TARGET_MOD subset of those. Selection
# is the deterministic rank variant, so every dsir_* column is an
# EXACT value the oracle replays from scratch (md5 buckets, grid-6
# log-ratios, grid-2 weights, (weight DESC, doc_id) top-k).
DSIR_MARK_MOD = 4
DSIR_TARGET_MOD = 20
DSIR_DOMAIN = " zq1 zq2 zq3 zq4 zq5 zq6"
DSIR_K = 60
DSIR_BUCKETS = 256
DSIR_ALPHA = 1.0


def _dsir_corpus(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(DSIR_MARK_MOD)) == 0,
            F.concat(F.col("text"), F.lit(DSIR_DOMAIN)),
        ).otherwise(F.col("text")).alias("text"),
    )


def _dsir_agg(docs: DataFrame) -> DataFrame:
    src = _dsir_corpus(docs)
    target = src.where(F.pmod(F.col("doc_id"), F.lit(DSIR_TARGET_MOD)) == 0)
    sel = importance_resample(
        src, target, DSIR_K, n_buckets=DSIR_BUCKETS, alpha=DSIR_ALPHA
    )
    return sel.agg(
        F.count(F.lit(1)).alias("dsir_selected"),
        F.coalesce(
            F.sum((F.pmod(F.col("doc_id"), F.lit(DSIR_MARK_MOD)) == 0).cast("long")),
            F.lit(0),
        ).cast("long").alias("dsir_marked_selected"),
        grid(
            F.coalesce(F.sum(grid(F.col("weight"), 2)), F.lit(0.0)), 2
        ).alias("dsir_weight_total"),
    )


def dsir_resample_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only serving path: the DSIR selection exactly as the
    driver row runs it (same injection, same k), without the
    surrounding corpus-pipeline aggregates — so round-over-round
    drift in the selection cost is separable (the
    corpus_hygiene_serving precedent). Not in the driver registry:
    every value is already oracle-covered via corpus_build_summary's
    dsir_* columns."""
    docs = table(spark, sf_dir, "documents")
    src = _dsir_corpus(docs)
    target = src.where(F.pmod(F.col("doc_id"), F.lit(DSIR_TARGET_MOD)) == 0)
    return importance_resample(
        src, target, DSIR_K, n_buckets=DSIR_BUCKETS, alpha=DSIR_ALPHA
    )


# PageRank link-graph quality prior (r8, operators/pagerank.py): a
# deterministic citation-style graph over the documents table — every
# non-dangling doc links to two arithmetic neighbours, every 10th doc
# reinforces doc 0 (a planted hub), every 17th doc has NO out-edges
# (dangling mass must teleport). Integer fixed-point iteration makes
# every pr_* column an EXACT value the oracle replays with the same
# unrolled update rule.
PR_DANGLING_MOD = 17
PR_HUB_MOD = 10
PR_ITERS = 6


def _pr_edges(docs: DataFrame) -> DataFrame:
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    ids = docs.select(F.col("doc_id").cast("long").alias("src")).crossJoin(
        F.broadcast(n_df)
    )
    linked = ids.where(F.pmod(F.col("src"), F.lit(PR_DANGLING_MOD)) != 0)
    two = linked.select(
        "src",
        F.explode(
            F.array(
                F.pmod(F.col("src") * 7 + 3, F.col("__n")),
                F.pmod(F.col("src") * 13 + 5, F.col("__n")),
            )
        ).alias("dst"),
    )
    hub = linked.where(F.pmod(F.col("src"), F.lit(PR_HUB_MOD)) == 0).select(
        "src", F.lit(0).cast("long").alias("dst")
    )
    return two.unionByName(hub)


def _pr_agg(docs: DataFrame) -> DataFrame:
    ranks = pagerank(_pr_edges(docs), iterations=PR_ITERS)
    top = F.max(F.struct(F.col("rank"), (-F.col("node")).alias("__neg")))
    return ranks.agg(
        F.count(F.lit(1)).cast("long").alias("pr_nodes"),
        F.sum("rank").cast("long").alias("pr_rank_total"),
        F.max("rank").cast("long").alias("pr_top_rank"),
        (-top.getField("__neg")).cast("long").alias("pr_top_node"),
    )


HITS_ITERS = 4


def _hits_agg(docs: DataFrame) -> DataFrame:
    """r10: HITS hub/authority over the SAME citation edge set as
    pr_* (operators/pagerank.py::hits — exact integer L1-normalized
    half-steps), reduced to exact LONG scalars the oracle replays as
    unrolled iterations."""
    from ..operators.pagerank import hits

    s = hits(_pr_edges(docs), iterations=HITS_ITERS)
    topa = F.max(F.struct(F.col("authority"), (-F.col("node")).alias("__n")))
    toph = F.max(F.struct(F.col("hub"), (-F.col("node")).alias("__n")))
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("hits_nodes"),
        F.sum("authority").cast("long").alias("hits_auth_total"),
        F.sum("hub").cast("long").alias("hits_hub_total"),
        F.max("authority").cast("long").alias("hits_top_auth"),
        (-topa.getField("__n")).cast("long").alias("hits_top_auth_node"),
        F.max("hub").cast("long").alias("hits_top_hub"),
        (-toph.getField("__n")).cast("long").alias("hits_top_hub_node"),
        F.sum(
            (F.col("node") % 97) * (F.col("authority") * 31 + F.col("hub"))
        ).cast("long").alias("hits_fp"),
    )


# per-domain cap (r8, operators/sampling.py::top_k_per_group): keep
# the CAP_K longest docs per source (doc_id tie-break = total order,
# so the selected SET is engine-exact); the fingerprint pins the
# exact selection, not just its size.
CAP_K = 7


def _cap_agg(docs: DataFrame) -> DataFrame:
    from ..operators.sampling import top_k_per_group

    kept = top_k_per_group(
        docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], CAP_K
    )
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("cap_docs"),
        F.coalesce(
            F.sum(F.col("doc_id") * 13 + F.col("n_chars")), F.lit(0)
        ).cast("long").alias("cap_fp"),
    )


# A-ES weighted sample (r8, operators/sampling.py::weighted_sample):
# WS_K docs proportional to n_chars, md5-derived uniforms — the
# selected set is a pure function of the data, so the fingerprint is
# an exact cross-engine value.
WS_K = 40


def _ws_agg(docs: DataFrame) -> DataFrame:
    from ..operators.sampling import weighted_sample

    sel = weighted_sample(docs, "n_chars", WS_K, ("doc_id",))
    return sel.agg(
        F.count(F.lit(1)).cast("long").alias("ws_docs"),
        F.coalesce(
            F.sum(F.col("doc_id") * 31 + F.col("n_chars")), F.lit(0)
        ).cast("long").alias("ws_fp"),
    )


TBS_BUDGET = 1500


def _tbs_agg(docs: DataFrame) -> DataFrame:
    """``tbs_*`` (r12): the token-budget mixture sampler
    (operators/sampling.py::token_budget_sample — per SOURCE, take
    docs in engine-portable md5 order until the running n_chars total
    reaches the budget, doc-atomic overflow-by-one). Exact selected-set
    values the oracle replays window-for-window, plus the earned
    overflow bound as a boolean."""
    from ..operators.sampling import token_budget_sample

    sel = token_budget_sample(
        docs, TBS_BUDGET, "n_chars", ("doc_id",), group_col="source"
    )
    per_group = sel.groupBy("source").agg(
        F.sum("n_chars").alias("__tok"), F.max("n_chars").alias("__mx")
    )
    bound = per_group.agg(
        F.min(
            F.col("__tok") < F.lit(TBS_BUDGET) + F.col("__mx")
        ).alias("tbs_atomic_ok")
    )
    return sel.agg(
        F.count(F.lit(1)).cast("long").alias("tbs_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("tbs_tokens"),
        F.coalesce(
            F.sum(F.col("doc_id") * 17 + F.col("n_chars")), F.lit(0)
        ).cast("long").alias("tbs_fp"),
    ).crossJoin(F.broadcast(bound))


def corpus_build_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per split: earned contract booleans + the replicable
    gate count. All heavy work is the corpus pipeline itself; the
    summary adds two 3-row aggregates."""
    cfg = CorpusConfig()
    # the shared persisted corpus frame (hygiene_plans, r8): this row
    # fans out into the pipeline + dsir + pagerank + cap aggregates,
    # each of which would otherwise re-scan the parquet
    from .hygiene_plans import _shared_docs

    docs = _shared_docs(spark, sf_dir)
    # lazy lineage cut (r10): the built corpus feeds BOTH the
    # per-split aggregate and the packing summary — without it each
    # consumer re-runs the whole gate→dedup→split→pack pipeline
    # (measured ~3x on the pair of aggregates)
    corpus = build_corpus(docs, cfg).localCheckpoint(eager=False)

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
        .crossJoin(F.broadcast(_dsir_agg(docs)))
        .crossJoin(F.broadcast(_pr_agg(docs)))
        .crossJoin(F.broadcast(_hits_agg(docs)))
        .crossJoin(F.broadcast(_cap_agg(docs)))
        .crossJoin(F.broadcast(_ws_agg(docs)))
        .crossJoin(F.broadcast(_tbs_agg(docs)))
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
            # r7: DSIR importance-resampling exact contract values
            "dsir_selected",
            "dsir_marked_selected",
            "dsir_weight_total",
            # r8: PageRank link-graph prior, exact fixed-point values
            "pr_nodes",
            "pr_rank_total",
            "pr_top_rank",
            "pr_top_node",
            # r10: HITS hub/authority, exact fixed-point values
            "hits_nodes",
            "hits_auth_total",
            "hits_hub_total",
            "hits_top_auth",
            "hits_top_auth_node",
            "hits_top_hub",
            "hits_top_hub_node",
            "hits_fp",
            # r8: per-domain cap — exact selected-set fingerprint
            "cap_docs",
            "cap_fp",
            # r8: A-ES weighted sample — exact selected-set fingerprint
            "ws_docs",
            "ws_fp",
            # r12: token-budget mixture sampler — exact selected set
            "tbs_docs",
            "tbs_tokens",
            "tbs_fp",
            "tbs_atomic_ok",
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
), ds_src AS (
    SELECT doc_id,
           CASE WHEN doc_id % {DSIR_MARK_MOD} = 0 THEN text || '{DSIR_DOMAIN}'
                ELSE text END AS text
    FROM documents
), ds_tok AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM ds_src
), ds_occ AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('dsir|' || tok), 1, 8)) AS BIGINT)
               % {DSIR_BUCKETS} AS bucket
    FROM (SELECT doc_id, unnest(t) AS tok FROM ds_tok)
), ds_cp AS (
    SELECT bucket, COUNT(*) AS cr FROM ds_occ GROUP BY bucket
), ds_tp AS (
    SELECT bucket, COUNT(*) AS ct FROM ds_occ
    WHERE doc_id % {DSIR_TARGET_MOD} = 0 GROUP BY bucket
), ds_tot AS (
    SELECT (SELECT COALESCE(SUM(ct), 0) FROM ds_tp) AS tt,
           (SELECT COALESCE(SUM(cr), 0) FROM ds_cp) AS tr
), ds_lam AS (
    SELECT b.bucket,
           {grid_sql(f"ln(COALESCE(ct, 0) + {DSIR_ALPHA}) - ln(tt + {DSIR_ALPHA} * {DSIR_BUCKETS})", 6)}
         - {grid_sql(f"ln(COALESCE(cr, 0) + {DSIR_ALPHA}) - ln(tr + {DSIR_ALPHA} * {DSIR_BUCKETS})", 6)} AS lam
    FROM (SELECT bucket FROM ds_cp UNION SELECT bucket FROM ds_tp) b
    LEFT JOIN ds_tp USING (bucket) LEFT JOIN ds_cp USING (bucket)
    CROSS JOIN ds_tot
), ds_sums AS (
    SELECT o.doc_id, {grid_sql('SUM(lam)', 2)} AS weight
    FROM ds_occ o JOIN ds_lam USING (bucket)
    GROUP BY o.doc_id
), ds_w AS (
    -- zero-token docs keep weight 0.0 (Spark's explode_outer path)
    SELECT s.doc_id, COALESCE(w.weight, 0.0) AS weight
    FROM ds_src s LEFT JOIN ds_sums w USING (doc_id)
), ds_sel AS (
    SELECT doc_id, weight FROM ds_w
    ORDER BY weight DESC, doc_id LIMIT {DSIR_K}
), dsir AS (
    SELECT COUNT(*) AS dsir_selected,
           COALESCE(SUM(CASE WHEN doc_id % {DSIR_MARK_MOD} = 0 THEN 1 ELSE 0 END), 0) AS dsir_marked_selected,
           {grid_sql("COALESCE(SUM(" + grid_sql("weight", 2) + "), 0)", 2)} AS dsir_weight_total
    FROM ds_sel
), {{PR_CTES}},
cap AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS cap_docs,
           CAST(COALESCE(SUM(doc_id * 13 + n_chars), 0) AS BIGINT) AS cap_fp
    FROM (
        SELECT doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents)
    WHERE rn <= {{CAP_K}}
),
ws AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS ws_docs,
           CAST(COALESCE(SUM(doc_id * 31 + n_chars), 0) AS BIGINT) AS ws_fp
    FROM (
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars,
                   floor(ln((CAST(('0x' || substr(md5('wsample' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                            / 4294967296.0) / n_chars * 1000000 + 0.5) / 1000000 AS es_key
            FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        ORDER BY es_key DESC, doc_id LIMIT {{WS_K}})
)
,
tbs AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS tbs_docs,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS tbs_tokens,
           CAST(COALESCE(SUM(doc_id * 17 + n_chars), 0) AS BIGINT) AS tbs_fp
    FROM (
        SELECT doc_id, n_chars,
               SUM(n_chars) OVER (PARTITION BY source
                                  ORDER BY md5('tbudget' || chr(31) || CAST(doc_id AS VARCHAR)), doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0)
    WHERE c - n_chars < {TBS_BUDGET}
)
SELECT s.split, g.n_gated,
       true AS nonempty_ok, true AS ratio_ok, true AS packs_ok,
       CAST(d.dsir_selected AS BIGINT) AS dsir_selected,
       CAST(d.dsir_marked_selected AS BIGINT) AS dsir_marked_selected,
       d.dsir_weight_total,
       CAST(p.pr_nodes AS BIGINT) AS pr_nodes,
       CAST(p.pr_rank_total AS BIGINT) AS pr_rank_total,
       CAST(p.pr_top_rank AS BIGINT) AS pr_top_rank,
       CAST(p.pr_top_node AS BIGINT) AS pr_top_node,
       hx.hits_nodes, hx.hits_auth_total, hx.hits_hub_total,
       hx.hits_top_auth, hx.hits_top_auth_node,
       hx.hits_top_hub, hx.hits_top_hub_node, hx.hits_fp,
       c.cap_docs, c.cap_fp,
       w.ws_docs, w.ws_fp,
       tb.tbs_docs, tb.tbs_tokens, tb.tbs_fp, true AS tbs_atomic_ok
FROM (VALUES ('train'), ('val'), ('test')) s(split), gated g, dsir d, pr p,
     hits_agg hx, cap c, ws w, tbs tb
"""


def _pr_oracle_ctes(iterations: int = PR_ITERS, unit: int = UNIT) -> str:
    """Unrolled fixed-point power iteration — standard SQL forbids
    aggregation in a recursive CTE term, so the FIXED iteration count
    becomes one CTE pair per step. Same integer update rule as
    operators/pagerank.py, `//` for div.

    Every CTE is ``AS MATERIALIZED`` (r9, r8 advisor): DuckDB inlines
    a copy of a plain CTE per reference, and pr_r{k} is referenced by
    BOTH pr_c{k+1} and pr_d{k+1} — ~3.5x cost per iteration
    compounding to ~2 minutes at 6 iterations on the 500-row fixture.
    Materialized, the identical result returns in ~0.05s and raising
    PR_ITERS stays feasible."""
    ctes = [
        f"""pr_e AS MATERIALIZED (
    SELECT CAST(doc_id AS BIGINT) AS src,
           CAST((doc_id * 7 + 3) % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
    FROM documents WHERE doc_id % {PR_DANGLING_MOD} != 0
    UNION ALL
    SELECT doc_id, (doc_id * 13 + 5) % (SELECT COUNT(*) FROM documents)
    FROM documents WHERE doc_id % {PR_DANGLING_MOD} != 0
    UNION ALL
    SELECT doc_id, 0 FROM documents
    WHERE doc_id % {PR_DANGLING_MOD} != 0 AND doc_id % {PR_HUB_MOD} = 0
)""",
        """pr_nset AS MATERIALIZED (
    SELECT DISTINCT node FROM (
        SELECT src AS node FROM pr_e UNION ALL SELECT dst FROM pr_e)
)""",
        """pr_deg AS MATERIALIZED (
    SELECT node, COALESCE(d.c, 0) AS out_deg
    FROM pr_nset LEFT JOIN (
        SELECT src, COUNT(*) AS c FROM pr_e GROUP BY src) d ON node = d.src
)""",
        "pr_cnt AS MATERIALIZED (SELECT COUNT(*) AS nn FROM pr_nset)",
        f"""pr_r0 AS MATERIALIZED (
    SELECT node, out_deg, CAST({unit} AS BIGINT) // nn AS rank
    FROM pr_deg, pr_cnt
)""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""pr_c{k} AS MATERIALIZED (
    SELECT e.dst AS node, SUM(r.rank // r.out_deg) AS inc
    FROM pr_r{k - 1} r JOIN pr_e e ON r.node = e.src
    WHERE r.out_deg > 0 GROUP BY e.dst
)""")
        ctes.append(f"""pr_d{k} AS MATERIALIZED (
    SELECT COALESCE(SUM(rank), 0) AS dang FROM pr_r{k - 1} WHERE out_deg = 0
)""")
        ctes.append(f"""pr_r{k} AS MATERIALIZED (
    SELECT b.node, b.out_deg,
           (15 * CAST({unit} AS BIGINT)) // (100 * nn)
         + (85 * (COALESCE(c.inc, 0) + dang // nn)) // 100 AS rank
    FROM pr_deg b LEFT JOIN pr_c{k} c ON b.node = c.node, pr_d{k}, pr_cnt
)""")
    ctes.append(f"""pr AS MATERIALIZED (
    SELECT COUNT(*) AS pr_nodes, SUM(rank) AS pr_rank_total,
           MAX(rank) AS pr_top_rank,
           MIN(node) FILTER (
               WHERE rank = (SELECT MAX(rank) FROM pr_r{iterations})
           ) AS pr_top_node
    FROM pr_r{iterations}
)""")
    return ",\n".join(ctes)


def _hits_oracle_ctes(
    iterations: int = 4, scale: int = 1_000_000
) -> str:
    """Unrolled HITS half-steps over the pr_e/pr_nset/pr_cnt citation
    CTEs (operators/pagerank.py::hits): L1-normalized integer grid,
    ``(raw * scale) // total`` — all values non-negative, so the
    truncating `//` equals the Spark `div`. Materialized per the pr_*
    lesson (each frame has two readers)."""
    ctes = [
        f"""h_h0 AS MATERIALIZED (
    SELECT node, CAST({scale} AS BIGINT) // nn AS s FROM pr_nset, pr_cnt
)"""
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""h_ar{k} AS MATERIALIZED (
    SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS raw
    FROM h_h{k - 1} h JOIN pr_e e ON h.node = e.src GROUP BY e.dst
)""")
        ctes.append(f"""h_at{k} AS MATERIALIZED (
    SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS tot FROM h_ar{k}
)""")
        ctes.append(f"""h_a{k} AS MATERIALIZED (
    SELECT n.node,
           CASE WHEN tot > 0
                THEN (COALESCE(r.raw, 0) * CAST({scale} AS BIGINT)) // tot
                ELSE 0 END AS s
    FROM pr_nset n LEFT JOIN h_ar{k} r ON n.node = r.node, h_at{k}
)""")
        ctes.append(f"""h_hr{k} AS MATERIALIZED (
    SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS raw
    FROM h_a{k} a JOIN pr_e e ON a.node = e.dst GROUP BY e.src
)""")
        ctes.append(f"""h_ht{k} AS MATERIALIZED (
    SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS tot FROM h_hr{k}
)""")
        ctes.append(f"""h_h{k} AS MATERIALIZED (
    SELECT n.node,
           CASE WHEN tot > 0
                THEN (COALESCE(r.raw, 0) * CAST({scale} AS BIGINT)) // tot
                ELSE 0 END AS s
    FROM pr_nset n LEFT JOIN h_hr{k} r ON n.node = r.node, h_ht{k}
)""")
    it = iterations
    ctes.append(f"""hits_agg AS MATERIALIZED (
    SELECT CAST(COUNT(*) AS BIGINT) AS hits_nodes,
           CAST(SUM(a.s) AS BIGINT) AS hits_auth_total,
           CAST(SUM(h.s) AS BIGINT) AS hits_hub_total,
           CAST(MAX(a.s) AS BIGINT) AS hits_top_auth,
           CAST(MIN(a.node) FILTER (
               WHERE a.s = (SELECT MAX(s) FROM h_a{it})
           ) AS BIGINT) AS hits_top_auth_node,
           CAST(MAX(h.s) AS BIGINT) AS hits_top_hub,
           CAST(MIN(h.node) FILTER (
               WHERE h.s = (SELECT MAX(s) FROM h_h{it})
           ) AS BIGINT) AS hits_top_hub_node,
           CAST(SUM((a.node % 97) * (a.s * 31 + h.s)) AS BIGINT) AS hits_fp
    FROM h_a{it} a JOIN h_h{it} h ON a.node = h.node
)""")
    return ",\n".join(ctes)


CORPUS_BUILD_SUMMARY_SQL = CORPUS_BUILD_SUMMARY_SQL.replace(
    "{PR_CTES}", _pr_oracle_ctes() + ",\n" + _hits_oracle_ctes(HITS_ITERS)
).replace("{CAP_K}", str(CAP_K)).replace("{WS_K}", str(WS_K))


QUERIES = {"corpus_build_summary": corpus_build_summary}
ORACLES = {"corpus_build_summary": CORPUS_BUILD_SUMMARY_SQL}
