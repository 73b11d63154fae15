"""N-gram language-model perplexity scoring — the CCNet-style
quality filter (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): train a smoothed bigram
LM on a trusted reference slice, score every document by its
per-token cross-entropy under that model, and flag the
high-perplexity tail for removal or down-weighting.

Model: add-k-smoothed bigram LM with a BOS context::

    p(w | ctx) = (c(ctx, w) + k) / (c(ctx) + k * V)

where ``c`` are counts on the TRAIN slice, ``V`` is the train-slice
unigram vocabulary size, and the first token of each document is
conditioned on the ``<s>`` BOS context. A document's score is the sum
of ``ln p(w_i | w_{i-1})`` over its tokens; the per-token average is
its cross-entropy in nats (perplexity = exp of that).

Cross-engine exactness (the fixed-point discipline from
operators/divergence.py): every bigram's log-probability term is
snapped to an integer number of NANO-nats
(``floor(ln(num/den) * 1e9 + 0.5)`` — the num/den division, the
``ln`` and the snap are the same IEEE double ops on Spark and
DuckDB) and per-document totals are LONG sums, so scores are exact
and invariant to partitioning and summation order. The
high-perplexity flag is an INTEGER comparison
(``lp_nanos < -theta_nanos * n_bigrams``) — no double division
anywhere past the per-term snap.

Scale shape (100 TB):
- each corpus is tokenized + bigrammed ONCE (one ``explode`` of a
  per-row ``transform`` array — no second corpus scan; training
  counts and the vocabulary are re-aggregations of that exploded
  frame);
- the model is bounded by the number of DISTINCT observed bigrams
  (Heaps-law small relative to the corpus) and the context-total
  table by the vocabulary — both sides of the scoring joins are
  model-sized; AQE broadcasts them when they fit;
- the scoring pass is the only corpus-sized shuffle (bigram
  explode feeding the per-doc LONG re-aggregation); there is no
  window, no collect, no Python anywhere.

Tokenization matches operators/vocab.py / operators/divergence.py
exactly (lowercase, split on ``\\s+``, drop empties) so one exploded
frame could serve all three families in a fused pipeline.

Relation to operators/ranking.py::bigram_lm_scores (the KenLM-style
SELF-trained fluency signal): that operator trains on the scored
corpus itself and reports per-doc perplexity as grid-6 doubles; this
one is the CROSS-DOMAIN filter — train on a trusted reference slice,
score everything (including wholly out-of-distribution documents,
hence the BOS context and the unseen-context ln(1/V) floor), and
reduce to driver-grade integer fingerprints. Both share the
tokenization contract.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no text-quality surface (dags/ are format-comparison ETL);
extension surface per the training-data-pipeline brief (SURVEY §2
extensions — quality-scoring family, next to the Naive-Bayes
classifier in operators/classify.py and DSIR in
operators/importance.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000

#: BOS context for the first token of every document
BOS = "<s>"

#: add-k smoothing constant (0.5 = Jeffreys; exact in binary, so
#: ``c + K`` and ``K * V`` are IEEE-exact on every engine)
SMOOTH_K = 0.5

#: default flag threshold in nats-per-token (integer nanos). A doc
#: whose average cross-entropy exceeds this is "high-perplexity".
#: Calibrated on the synthetic testdata corpus (which draws every
#: language from one shared word pool, so the modes sit close
#: together): the en-trained model scores en docs at mean 3.36
#: nats/token (max 3.474 at the driver's sf0.01) and non-en docs at
#: mean ~3.44; 3.48 flags zero in-distribution docs and the
#: out-of-distribution tail (59 of 282 non-en docs at sf0.01). Real
#: deployments recalibrate per reference corpus — the flag mechanics
#: (integer cross-multiplied compare) are threshold-agnostic.
THETA_NANOS = 3_480_000_000


def _tokens(text_col):
    """Filtered token array: lowercase, split on whitespace, empties
    dropped (identical to operators/divergence.group_word_counts but
    kept as an ARRAY so bigram adjacency survives)."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ("doc_id",)
) -> DataFrame:
    """One row per (doc, position): (``ctx``, ``w``) bigram pairs with
    a BOS context for position 1. Empty documents contribute no rows.
    This is THE corpus-sized explode — train counts, vocabulary and
    scoring all derive from it."""
    # Materialize the token array behind a projection boundary, then
    # zip it with its BOS-shifted self. NEVER index the array from
    # inside a per-element lambda (element_at(ws, i) in a transform
    # re-evaluates the split+filter expression for every element —
    # O(tokens^2) regex work per document; measured 13.6 s for the
    # sf0.1 bigram count vs 0.4 s for this shape).
    pair_t = "array<struct<ctx:string,w:string>>"
    with_ws = docs.select(
        *keep_cols, _tokens(F.col(text_col)).alias("__ws")
    )
    ws = F.col("__ws")
    ctxs = F.concat(
        F.array(F.lit(BOS)),
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
    )
    pairs = F.when(
        F.size(ws) > 0,
        F.zip_with(
            ctxs, ws,
            lambda a, b: F.struct(a.alias("ctx"), b.alias("w")),
        ),
    ).otherwise(F.expr(f"CAST(array() AS {pair_t})"))
    return with_ws.select(*keep_cols, F.explode(pairs).alias("bg")).select(
        *keep_cols, F.col("bg.ctx").alias("ctx"), F.col("bg.w").alias("w")
    )


def bigram_lm_train(train_docs: DataFrame, text_col: str = "text"):
    """Train the smoothed bigram LM on a reference slice.

    Returns ``(model, ctx_totals, vocab)`` DataFrames:
    - ``model``: (ctx, w, c) distinct observed bigrams with counts;
    - ``ctx_totals``: (ctx, cc) total count per context;
    - ``vocab``: single row (v) — train-slice unigram vocabulary size
      (the ``w`` side covers every train token, BOS is a context
      only).

    All three are re-aggregations of ONE bigram explode over the
    train slice; the model frame's lineage is CUT (lazy
    localCheckpoint — the dedup_stage discipline) so its
    train-slice-sized explode+count subtree evaluates once even
    though three consumers (the scoring join, ctx_totals, vocab)
    read it; without the cut Spark re-runs the subtree per consumer
    (measured: 4 Generates / 5 scans at sf0.1, 2 / 3 after).
    """
    bg = doc_bigrams(train_docs, text_col, keep_cols=())
    model = bg.groupBy("ctx", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    ctx_totals = model.groupBy("ctx").agg(
        F.sum("c").cast("long").alias("cc")
    )
    vocab = model.agg(
        F.count_distinct(F.col("w")).cast("long").alias("v")
    )
    return model, ctx_totals, vocab


def bigram_lm_score(
    docs: DataFrame,
    model: DataFrame,
    ctx_totals: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-document LM score: (id, *keep, n_bigrams, lp_nanos).

    ``lp_nanos`` is the LONG sum of nano-snapped
    ``ln((c + k) / (cc + k*V))`` bigram terms — exact,
    summation-order-proof. Documents with no tokens score
    (0, 0). Unseen bigram in a seen context -> ``ln(k/(cc+kV))``;
    wholly unseen context -> ``ln(1/V)``.

    Plan shape: bigram explode -> left join model (observed-bigram
    bounded) -> left join ctx_totals (vocab bounded) -> broadcast
    1-row vocab -> per-doc LONG sum, rejoined to the full doc list so
    empty docs keep a row.
    """
    keep = (id_col, *keep_cols)
    bg = doc_bigrams(docs, text_col, keep_cols=keep)
    num = F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(SMOOTH_K)
    den = (
        F.coalesce(F.col("cc"), F.lit(0)).cast("double")
        + F.lit(SMOOTH_K) * F.col("v")
    )
    # den == 0 only for a DEGENERATE model (empty train slice, V=0):
    # every probability is undefined, so terms score 0 — found by the
    # hypothesis sweep (ANSI division-by-zero otherwise)
    term = F.when(
        den > F.lit(0.0),
        F.floor(F.log(num / den) * NANO + F.lit(0.5)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    scored = (
        bg.join(model, ["ctx", "w"], "left")
        .join(ctx_totals, ["ctx"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(*keep)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(term).cast("long").alias("lp_nanos"),
        )
    )
    return (
        docs.select(*keep)
        .join(scored, list(keep), "left")
        .select(
            *keep,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("lp_nanos"), F.lit(0)).cast("long").alias(
                "lp_nanos"
            ),
        )
    )


def flag_high_perplexity(
    scored: DataFrame, theta_nanos: int = THETA_NANOS
) -> DataFrame:
    """Add ``flagged``: average cross-entropy above ``theta`` nats per
    token, decided by the exact INTEGER cross-multiplied comparison
    ``lp_nanos < -theta_nanos * n_bigrams`` (lp is negative; no
    double division). Empty docs are never flagged."""
    return scored.withColumn(
        "flagged",
        (F.col("n_bigrams") > 0)
        & (F.col("lp_nanos") < F.lit(-theta_nanos) * F.col("n_bigrams")),
    )


def perplexity_report(
    docs: DataFrame,
    train_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    train_group_value: str = "en",
    theta_nanos: int = THETA_NANOS,
) -> DataFrame:
    """One-scan-each LM quality report, reduced to exact LONGs.

    ``train_filter`` is a Column predicate selecting the reference
    slice (e.g. ``F.col("lang") == "en"``). Returns ONE row:

    - ``lm_train_docs`` / ``lm_vocab`` / ``lm_model_rows`` — trainer
      facts;
    - ``lm_scored_docs`` (docs with >= 1 token), ``lm_tokens``
      (total bigrams), ``lm_lp_nanos`` (corpus total log-prob);
    - ``lm_flagged_docs`` and the split ``lm_flagged_train_grp`` /
      ``lm_flagged_other`` — the discrimination statistic (the model
      should flag out-of-slice documents at a far higher rate);
    - ``lm_fp`` — per-doc fingerprint ``sum((id % 97) * lp_nanos)``
      so any single document's score moving is visible.
    """
    train = docs.where(train_filter)
    model, ctx_totals, vocab = bigram_lm_train(train, text_col)
    scored = flag_high_perplexity(
        bigram_lm_score(
            docs, model, ctx_totals, vocab, text_col, id_col,
            keep_cols=(group_col,),
        ),
        theta_nanos,
    )
    train_grp = F.col(group_col) == F.lit(train_group_value)
    facts = (
        model.agg(
            F.count(F.lit(1)).cast("long").alias("lm_model_rows"),
        )
        .crossJoin(F.broadcast(vocab.select(F.col("v").alias("lm_vocab"))))
        .crossJoin(
            F.broadcast(
                train.agg(
                    F.count(F.lit(1)).cast("long").alias("lm_train_docs")
                )
            )
        )
    )
    def _z(col):  # empty-corpus aggregates must read 0, not NULL
        return F.coalesce(col.cast("long"), F.lit(0).cast("long"))

    agg = scored.agg(
        _z(F.sum((F.col("n_bigrams") > 0).cast("long"))).alias(
            "lm_scored_docs"
        ),
        _z(F.sum("n_bigrams")).alias("lm_tokens"),
        _z(F.sum("lp_nanos")).alias("lm_lp_nanos"),
        _z(F.sum(F.col("flagged").cast("long"))).alias("lm_flagged_docs"),
        _z(F.sum((F.col("flagged") & train_grp).cast("long"))).alias(
            "lm_flagged_train_grp"
        ),
        _z(F.sum((F.col("flagged") & ~train_grp).cast("long"))).alias(
            "lm_flagged_other"
        ),
        _z(F.sum((F.col(id_col) % 97) * F.col("lp_nanos"))).alias("lm_fp"),
    )
    return agg.crossJoin(F.broadcast(facts)).select(
        "lm_train_docs",
        "lm_vocab",
        "lm_model_rows",
        "lm_scored_docs",
        "lm_tokens",
        "lm_lp_nanos",
        "lm_flagged_docs",
        "lm_flagged_train_grp",
        "lm_flagged_other",
        "lm_fp",
    )


# ---------------------------------------------------------------------------
# Trigram LM with STUPID BACKOFF (r11): the web-scale backoff of
# Brants et al. 2007 ("Large Language Models in Machine Translation")
# — the scheme you actually run at 100 TB, chosen there precisely
# because it needs NO normalization pass: the score
#
#     S(w | c2 c1) = c(c2 c1 w) / c(c2 c1)            if trigram seen
#                  = a * c(c1 w) / c(c1)              elif bigram seen
#                  = a^2 * (c(w) + k) / (N + k*V)     else (add-k OOV floor)
#
# with a = 0.4 is a relative score, not a probability, so every level
# is a plain count ratio — three model-bounded tables, zero
# renormalization shuffles. Closer to CCNet's KenLM filter than the
# add-k bigram above (higher order + backoff), while keeping the
# exact-integer discipline: each token's term is
# floor(ln(ratio) * 1e9 + 0.5) + backoffs * LN_ALPHA_NANOS — the ln
# snap is one IEEE double op (identical cross-engine) and the alpha
# penalty a PRECOMPUTED integer constant, so per-doc scores are LONG
# sums, partition-layout-proof and bit-replayable in DuckDB.
# ---------------------------------------------------------------------------

#: floor(ln(0.4) * 1e9 + 0.5) — the integer backoff penalty
LN_ALPHA_NANOS = -916_290_732

#: flag threshold for the stupid-backoff score (nats-per-token,
#: integer nanos). Calibrated like THETA_NANOS on the synthetic
#: corpus (en-trained): worst en per-token score is -2.584 nats at
#: sf0.001/0.01 and -3.590 at sf0.1, while the non-en tail reaches
#: -4.35; 3.8 flags ZERO en docs at sf0.001/0.01/0.1 and 102/81/19
#: non-en docs respectively (measured r11). Real deployments
#: recalibrate per reference corpus; the integer cross-multiplied
#: flag mechanics are threshold-agnostic.
THETA3_NANOS = 3_800_000_000


def doc_trigrams(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ("doc_id",)
) -> DataFrame:
    """One row per (doc, position): (``c2``, ``c1``, ``w``) with a
    double-BOS context (position 1 conditions on (<s>, <s>), position
    2 on (<s>, w1)). Empty documents contribute no rows. Same
    zip-not-index discipline as :func:`doc_bigrams` (indexing the
    token array inside a lambda re-runs the split per element —
    O(tokens^2))."""
    tri_t = "array<struct<c2:string,c1:string,w:string>>"
    with_ws = docs.select(
        *keep_cols, _tokens(F.col(text_col)).alias("__ws")
    )
    ws = F.col("__ws")
    # prepend the BOS pads THEN slice back to exactly size(ws):
    # building the context arrays as concat(pad, slice(ws, ...)) gives
    # length 2 for a 1-token doc (zip_with NULL-pads to the longest
    # side — caught by the hypothesis sweep), while slice-of-concat is
    # exactly size(ws) for every length
    c1s = F.slice(F.concat(F.array(F.lit(BOS)), ws), 1, F.size(ws))
    c2s = F.slice(
        F.concat(F.array(F.lit(BOS), F.lit(BOS)), ws), 1, F.size(ws)
    )
    zipped = F.zip_with(
        F.zip_with(
            c2s, c1s, lambda a, b: F.struct(a.alias("c2"), b.alias("c1"))
        ),
        ws,
        lambda cc, w: F.struct(
            cc["c2"].alias("c2"), cc["c1"].alias("c1"), w.alias("w")
        ),
    )
    tris = F.when(F.size(ws) > 0, zipped).otherwise(
        F.expr(f"CAST(array() AS {tri_t})")
    )
    return with_ws.select(*keep_cols, F.explode(tris).alias("tg")).select(
        *keep_cols,
        F.col("tg.c2").alias("c2"),
        F.col("tg.c1").alias("c1"),
        F.col("tg.w").alias("w"),
    )


def stupid_backoff_train(train_docs: DataFrame, text_col: str = "text"):
    """Train the three count tables from ONE trigram explode.

    Returns ``(tri, trictx, bi, bictx, uni, totals)``:
    - ``tri`` (c2, c1, w, c3) distinct observed trigrams;
    - ``trictx`` (c2, c1, ct) trigram-context totals;
    - ``bi`` (c1, w, cb) bigram counts — a re-aggregation of ``tri``
      (every position contributes exactly one trigram row, so
      grouping it by (c1, w) IS the bigram count over the same
      positions);
    - ``bictx`` (c1, cc) bigram-context totals;
    - ``uni`` (w, cu) unigram counts;
    - ``totals`` one row (n, v) — total tokens and vocabulary size.

    The ``tri`` lineage is cut (lazy localCheckpoint, the
    bigram_lm_train discipline) — five derived tables re-aggregate it
    without re-running the train-slice explode."""
    tg = doc_trigrams(train_docs, text_col, keep_cols=())
    tri = tg.groupBy("c2", "c1", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    ).localCheckpoint(eager=False)
    trictx = tri.groupBy("c2", "c1").agg(
        F.sum("c3").cast("long").alias("ct")
    )
    # r13 (guide §2.4): bi feeds four consumers (bictx, uni, the score
    # join, the report's row-count fact) — pin it so the re-aggregation
    # of tri runs once, not once per consumer
    bi = tri.groupBy("c1", "w").agg(
        F.sum("c3").cast("long").alias("cb")
    ).localCheckpoint(eager=False)
    bictx = bi.groupBy("c1").agg(F.sum("cb").cast("long").alias("cc"))
    # unigram counts cover every OUTCOME token (BOS is a context,
    # never an outcome — the `w` side already excludes it), including
    # document-initial positions, so N is the true train token count
    uni = bi.groupBy("w").agg(F.sum("cb").cast("long").alias("cu"))
    totals = uni.agg(
        F.coalesce(F.sum("cu"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    return tri, trictx, bi, bictx, uni, totals


def stupid_backoff_score(
    docs: DataFrame,
    tri: DataFrame,
    trictx: DataFrame,
    bi: DataFrame,
    bictx: DataFrame,
    uni: DataFrame,
    totals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-document stupid-backoff score: (id, *keep, n_tokens,
    sb_nanos, n_hit3, n_hit2, n_hit1) — the per-level hit counts are
    the model-coverage diagnostic (how often the trigram table
    answered vs backing off). Empty documents score (0, 0, 0, 0, 0).

    Plan shape: ONE corpus trigram explode, five model-bounded left
    joins (AQE broadcasts them when they fit), a CASE picking the
    deepest observed level, one per-doc LONG re-aggregation."""
    keep = (id_col, *keep_cols)
    tg = doc_trigrams(docs, text_col, keep_cols=keep)
    lvl3 = F.col("c3").isNotNull()
    lvl2 = F.col("cb").isNotNull()
    uden = F.col("n").cast("double") + F.lit(SMOOTH_K) * F.col("v")
    term = (
        F.when(
            lvl3,
            F.floor(
                F.log(F.col("c3").cast("double") / F.col("ct")) * NANO
                + F.lit(0.5)
            ).cast("long"),
        )
        .when(
            lvl2,
            F.floor(
                F.log(F.col("cb").cast("double") / F.col("cc")) * NANO
                + F.lit(0.5)
            ).cast("long")
            + F.lit(LN_ALPHA_NANOS),
        )
        .otherwise(
            F.when(
                uden > F.lit(0.0),
                F.floor(
                    F.log(
                        (
                            F.coalesce(F.col("cu"), F.lit(0)).cast("double")
                            + F.lit(SMOOTH_K)
                        )
                        / uden
                    )
                    * NANO
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            + F.lit(2 * LN_ALPHA_NANOS)
        )
    )
    scored = (
        tg.join(tri, ["c2", "c1", "w"], "left")
        .join(trictx, ["c2", "c1"], "left")
        .join(bi, ["c1", "w"], "left")
        .join(bictx, ["c1"], "left")
        .join(uni, ["w"], "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(*keep)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(term).cast("long").alias("sb_nanos"),
            F.sum(lvl3.cast("long")).cast("long").alias("n_hit3"),
            F.sum((~lvl3 & lvl2).cast("long")).cast("long").alias("n_hit2"),
            F.sum((~lvl3 & ~lvl2).cast("long")).cast("long").alias("n_hit1"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        docs.select(*keep)
        .join(scored, list(keep), "left")
        .select(
            *keep,
            F.coalesce(F.col("n_tokens"), zero).alias("n_tokens"),
            F.coalesce(F.col("sb_nanos"), zero).alias("sb_nanos"),
            F.coalesce(F.col("n_hit3"), zero).alias("n_hit3"),
            F.coalesce(F.col("n_hit2"), zero).alias("n_hit2"),
            F.coalesce(F.col("n_hit1"), zero).alias("n_hit1"),
        )
    )


def stupid_backoff_report(
    docs: DataFrame,
    train_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    train_group_value: str = "en",
    theta_nanos: int = THETA3_NANOS,
) -> DataFrame:
    """One exact-LONG row of sb_* scalars — the trigram companion to
    :func:`perplexity_report`: trainer facts (train docs, vocab,
    trigram/bigram model rows), corpus totals (scored docs, tokens,
    total score, per-level backoff hit counts), the integer
    high-score flag split by train group, and the per-doc
    fingerprint."""
    train = docs.where(train_filter)
    tri, trictx, bi, bictx, uni, totals = stupid_backoff_train(
        train, text_col
    )
    scored = stupid_backoff_score(
        docs, tri, trictx, bi, bictx, uni, totals, text_col, id_col,
        keep_cols=(group_col,),
    ).withColumn(
        "flagged",
        (F.col("n_tokens") > 0)
        & (F.col("sb_nanos") < F.lit(-theta_nanos) * F.col("n_tokens")),
    )
    train_grp = F.col(group_col) == F.lit(train_group_value)
    facts = (
        tri.agg(F.count(F.lit(1)).cast("long").alias("sb_tri_rows"))
        .crossJoin(
            F.broadcast(
                bi.agg(F.count(F.lit(1)).cast("long").alias("sb_bi_rows"))
            )
        )
        .crossJoin(
            F.broadcast(
                totals.select(
                    F.col("n").alias("sb_train_tokens"),
                    F.col("v").alias("sb_vocab"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                train.agg(
                    F.count(F.lit(1)).cast("long").alias("sb_train_docs")
                )
            )
        )
    )

    def _z(col):
        return F.coalesce(col.cast("long"), F.lit(0).cast("long"))

    agg = scored.agg(
        _z(F.sum((F.col("n_tokens") > 0).cast("long"))).alias(
            "sb_scored_docs"
        ),
        _z(F.sum("n_tokens")).alias("sb_tokens"),
        _z(F.sum("sb_nanos")).alias("sb_nanos_total"),
        _z(F.sum("n_hit3")).alias("sb_hit3"),
        _z(F.sum("n_hit2")).alias("sb_hit2"),
        _z(F.sum("n_hit1")).alias("sb_hit1"),
        _z(F.sum(F.col("flagged").cast("long"))).alias("sb_flagged_docs"),
        _z(F.sum((F.col("flagged") & train_grp).cast("long"))).alias(
            "sb_flagged_train_grp"
        ),
        _z(F.sum((F.col("flagged") & ~train_grp).cast("long"))).alias(
            "sb_flagged_other"
        ),
        _z(F.sum((F.col(id_col) % 97) * F.col("sb_nanos"))).alias("sb_fp"),
    )
    return agg.crossJoin(F.broadcast(facts)).select(
        "sb_train_docs",
        "sb_train_tokens",
        "sb_vocab",
        "sb_tri_rows",
        "sb_bi_rows",
        "sb_scored_docs",
        "sb_tokens",
        "sb_nanos_total",
        "sb_hit3",
        "sb_hit2",
        "sb_hit1",
        "sb_flagged_docs",
        "sb_flagged_train_grp",
        "sb_flagged_other",
        "sb_fp",
    )
