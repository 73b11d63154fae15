"""Exact distributed evaluation of binary classifiers / quality
filters: ROC-AUC in the rank-free Mann-Whitney form, plus confusion
counts and the derived precision/recall/F1 rates — the measurement
half of every keep-vs-drop filter in a training-data pipeline (the
Naive-Bayes classifier in operators/classify.py, the CCNet bigram-LM
filter in operators/lm.py, DSIR weights in operators/importance.py
all produce scores whose usefulness IS their ranking quality).

ROC-AUC without a global sort: the textbook estimator is the
Mann-Whitney U statistic — rank all scores, sum the positive ranks —
which naively needs a TOTAL ORDER (a single-partition window at
corpus grain). This operator computes the identical quantity from
GROUPED counts instead::

    per distinct score s:   pos(s), neg(s)
    2 * U = Σ_s pos(s) * (2 * cumneg(<s) + neg(s))
    AUC   = U / (P * N)

(the ``pos*neg`` term is exactly the tie midrank correction). The
cumulative ``cumneg(<s)`` runs two-phase: scores are range-bucketed
by ``score DIV 2^bucket_shift`` (truncating division — identical in
Spark ``DIV`` and DuckDB ``//`` for negatives too, and monotone in
the score, so bucket order is score order); within-bucket cumulation
is a window PARTITIONED BY bucket, and only the bucket TOTALS — a
frame bounded by the score range / 2^bucket_shift, independent of
corpus size — pass through a global-order window (the documented
bounded-aggregate exception, the plans/streaming_plans.py
precedent). No corpus-grain total order anywhere.

Exactness: scores and labels are LONGs; U, P, N are LONG sums;
``auc_nanos = (2U * 1e9) DIV (2PN)`` does its ``*1e9`` scaling in
DECIMAL(38,0) (Spark decimal ``DIV`` == DuckDB HUGEINT ``//``,
verified) and is bit-equal cross-engine. Honest envelope (r10
advice): ``auc_num`` (= 2U ≤ 2PN) and ``auc_den`` (= 2PN) are LONG,
so the operator is exact while ``P * N < 2^62`` — e.g. 2.1e9
positives × 2.1e9 negatives, or 4.6e13 × 10^5, far past any labeled
eval set; past that, pre-aggregate per shard and feed
``full_eval_from_counts`` with DECIMAL inputs. ``n_pos`` / ``n_neg``
themselves are exact to 2^63 rows.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no evaluation surface (dags/ are format-comparison ETL);
extension surface per the training-data-pipeline brief (SURVEY §2
extensions — the evaluation companion to the quality-scoring
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default range-bucket width exponent for the two-phase cumulative:
#: nano-scaled scores spanning ±1e15 make ~2^51/2^44 ≈ 128 buckets.
AUC_BUCKET_SHIFT = 44


def _dec_div_nanos(num, den):
    """floor((num * 1e9) / den) in DECIMAL(38,0) — overflow-free and
    bit-equal to DuckDB ``(num::HUGEINT * 1000000000) // den``."""
    return F.expr(
        f"CAST((CAST({num} AS DECIMAL(38,0)) * 1000000000) "
        f"DIV CAST({den} AS DECIMAL(38,0)) AS BIGINT)"
    )


def auc_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """One exact row: ``auc_num`` (= 2U, LONG), ``auc_den`` (= 2PN,
    LONG), ``auc_nanos`` (floor(AUC * 1e9), decimal-exact), ``n_pos``,
    ``n_neg``. Higher score ranks toward label 1; ties contribute the
    Mann-Whitney midrank 1/2. Degenerate inputs (no positives or no
    negatives, or empty) return ``auc_den = 0`` and ``auc_nanos = 0``
    — well-defined, never a division error."""
    per_score = (
        scored.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
    )
    return auc_from_counts(per_score, bucket_shift=bucket_shift)


def auc_from_counts(
    per_score: DataFrame,
    score_col: str = "s",
    pos_col: str = "pos",
    neg_col: str = "neg",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """:func:`auc_report` over PRE-AGGREGATED per-score class counts
    ``(score, pos, neg)`` — the mergeable form: per-score counts are
    additive, so shard- or micro-batch-level count tables can be
    summed and fed here (the streaming AUC monitor's read path).
    Duplicate score rows are re-aggregated first, so callers may pass
    an unmerged union of count tables directly."""
    width = 1 << bucket_shift
    per_score = (
        per_score.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(pos_col).cast("long").alias("pos"),
            F.col(neg_col).cast("long").alias("neg"),
        )
        .groupBy("s")
        .agg(
            F.sum("pos").cast("long").alias("pos"),
            F.sum("neg").cast("long").alias("neg"),
        )
        .withColumn("b", F.expr(f"s DIV {width}"))
        # r13 (guide §2.4): consumed by both the bucket-totals subtree
        # and the cum join — pin so the upstream aggregation runs once
        .localCheckpoint(eager=False)
    )
    bucket_totals = per_score.groupBy("b").agg(
        F.sum("neg").cast("long").alias("__bneg")
    )
    # global-order window over BUCKET TOTALS only (bounded frame)
    w_buckets = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "b", F.coalesce(F.sum("__bneg").over(w_buckets), F.lit(0)).alias("__off")
    )
    w_in = (
        Window.partitionBy("b").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.join(F.broadcast(offsets), "b").select(
        "s",
        "pos",
        "neg",
        (
            F.col("__off") + F.coalesce(F.sum("neg").over(w_in), F.lit(0))
        ).alias("cumneg"),
    )
    agg = cum.agg(
        F.coalesce(
            F.sum(F.col("pos") * (F.lit(2) * F.col("cumneg") + F.col("neg"))),
            F.lit(0),
        )
        .cast("long")
        .alias("auc_num"),
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("neg"), F.lit(0)).cast("long").alias("n_neg"),
    )
    return agg.select(
        "auc_num",
        (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            _dec_div_nanos("auc_num", "2 * n_pos * n_neg"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("auc_nanos"),
        "n_pos",
        "n_neg",
    )


def grouped_auc_report(
    scored: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    label_col: str = "label",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """Per-group exact ROC-AUC — one row per distinct ``group_cols``
    value with the same ``auc_num / auc_den / auc_nanos / n_pos /
    n_neg`` columns as :func:`auc_report`. The per-source quality
    monitor: which slice of the corpus does a filter actually rank
    well?

    Plan shape improves on the ungrouped case: BOTH cumulative
    windows are partitioned (within-bucket by ``(groups, b)``, bucket
    totals by ``groups``) — there is NO globally-ordered window
    anywhere, so the operator scales with groups x score-range, never
    through a single partition."""
    width = 1 << bucket_shift
    g = [F.col(c) for c in group_cols]
    per_score = (
        scored.select(
            *g,
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy(*group_cols, "s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
        .withColumn("b", F.expr(f"s DIV {width}"))
        # r13 (guide §2.4): consumed by both the offsets subtree and
        # the cum join — pin so the corpus-sized groupBy runs once
        .localCheckpoint(eager=False)
    )
    w_buckets = (
        Window.partitionBy(*group_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_score.groupBy(*group_cols, "b")
        .agg(F.sum("neg").cast("long").alias("__bneg"))
        .select(
            *group_cols,
            "b",
            F.coalesce(F.sum("__bneg").over(w_buckets), F.lit(0)).alias("__off"),
        )
    )
    w_in = (
        Window.partitionBy(*group_cols, "b")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.join(offsets, [*group_cols, "b"]).select(
        *group_cols,
        "pos",
        "neg",
        (F.col("__off") + F.coalesce(F.sum("neg").over(w_in), F.lit(0))).alias(
            "cumneg"
        ),
    )
    agg = cum.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.col("pos") * (F.lit(2) * F.col("cumneg") + F.col("neg"))),
            F.lit(0),
        )
        .cast("long")
        .alias("auc_num"),
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.sum("neg"), F.lit(0)).cast("long").alias("n_neg"),
    )
    return agg.select(
        *group_cols,
        "auc_num",
        (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            _dec_div_nanos("auc_num", "2 * n_pos * n_neg"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("auc_nanos"),
        "n_pos",
        "n_neg",
    )


def _cum_counts(
    scored: DataFrame, score_col: str, label_col: str, bucket_shift: int
) -> DataFrame:
    """(s, pos, neg, cumpos, cumneg): per distinct score, the class
    counts and the exclusive ascending cumulatives — the shared
    two-phase shape (range buckets; global-order window over bucket
    totals only) both AUC and threshold selection reduce to."""
    per_score = (
        scored.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
    )
    return _cum_from_counts(per_score, bucket_shift)


def _cum_from_counts(per_score: DataFrame, bucket_shift: int) -> DataFrame:
    """:func:`_cum_counts` over pre-aggregated (s, pos, neg) rows —
    re-aggregates duplicates first so unions of count shards can be
    fed directly (the streaming monitor's read path). Scores that net
    to pos = 0 AND neg = 0 after re-aggregation are dropped (r10
    advice): they are invisible to the raw-data path, so keeping them
    would inflate ``n_thresholds`` and, on an all-zero input, zero
    the F1 denominator."""
    width = 1 << bucket_shift
    # r13 (guide §2.4): the re-aggregated count frame feeds BOTH the
    # bucket-totals subtree and the final join — without a lineage cut
    # each consumer re-ran the caller's per-score aggregation (for
    # full_eval_report that is the corpus-sized groupBy). The lazy
    # localCheckpoint pins the distinct-score frame once.
    per_score = (
        per_score.groupBy("s")
        .agg(
            F.sum("pos").cast("long").alias("pos"),
            F.sum("neg").cast("long").alias("neg"),
        )
        .where((F.col("pos") + F.col("neg")) > 0)
        .withColumn("b", F.expr(f"s DIV {width}"))
        .localCheckpoint(eager=False)
    )
    bucket_totals = per_score.groupBy("b").agg(
        F.sum("pos").cast("long").alias("__bpos"),
        F.sum("neg").cast("long").alias("__bneg"),
    )
    w_buckets = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "b",
        F.coalesce(F.sum("__bpos").over(w_buckets), F.lit(0)).alias("__offp"),
        F.coalesce(F.sum("__bneg").over(w_buckets), F.lit(0)).alias("__offn"),
    )
    w_in = (
        Window.partitionBy("b").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    )
    return per_score.join(F.broadcast(offsets), "b").select(
        "s",
        "pos",
        "neg",
        (F.col("__offp") + F.coalesce(F.sum("pos").over(w_in), F.lit(0))).alias(
            "cumpos"
        ),
        (F.col("__offn") + F.coalesce(F.sum("neg").over(w_in), F.lit(0))).alias(
            "cumneg"
        ),
    )


def ks_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the label-1 and
    label-0 score distributions — the exact DISTRIBUTIONAL companion
    to the AUC (AUC measures ranking; KS measures the largest CDF
    gap, the classic score-separation / drift statistic).

    Exact integer form: ``D * P * N = max_s |cumpos(<=s)*N -
    cumneg(<=s)*P|`` over distinct scores (inclusive cumulatives) —
    no division until the final ``ks_nanos`` in DECIMAL(38,0).
    Returns one row: ``ks_num`` (the scaled max), ``ks_den`` (= P*N),
    ``ks_nanos`` (floor(D * 1e9)), ``ks_score`` (the smallest score
    achieving the max — deterministic tie rule), ``n_pos``,
    ``n_neg``. Degenerate inputs return zeros. Same two-phase
    cumulative shape as :func:`auc_report`."""
    cum = _cum_counts(scored, score_col, label_col, bucket_shift)
    tot = cum.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("P"),
        F.coalesce(F.sum("neg"), F.lit(0)).cast("long").alias("N"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        "P",
        "N",
        F.abs(
            (F.col("cumpos") + F.col("pos")) * F.col("N")
            - (F.col("cumneg") + F.col("neg")) * F.col("P")
        ).alias("gap"),
    )
    best = gaps.agg(
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("ks_num"),
        F.coalesce(F.max("P"), F.lit(0)).cast("long").alias("P"),
        F.coalesce(F.max("N"), F.lit(0)).cast("long").alias("N"),
    )
    pick = (
        gaps.crossJoin(F.broadcast(best.select(F.col("ks_num").alias("__m"))))
        .agg(
            F.coalesce(F.min(F.when(F.col("gap") == F.col("__m"), F.col("s"))), F.lit(0))
            .cast("long")
            .alias("ks_score")
        )
    )
    return best.crossJoin(F.broadcast(pick)).select(
        "ks_num",
        (F.col("P") * F.col("N")).cast("long").alias("ks_den"),
        F.when(
            (F.col("P") > 0) & (F.col("N") > 0),
            _dec_div_nanos("ks_num", "P * N"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ks_nanos"),
        "ks_score",
        F.col("P").alias("n_pos"),
        F.col("N").alias("n_neg"),
    )


def best_threshold_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """Exact threshold selection over the score distribution: for
    every candidate threshold t (each distinct score; predict 1 iff
    score >= t) evaluate Youden's J and F1, and return ONE row with
    the maxima and the thresholds achieving them.

    Exact integer forms: with tp(t) = positives scoring >= t and
    fp(t) likewise, ``J * P * N = tp*N - fp*P`` (``youden_scaled``, a
    LONG — no division), and F1 = 2tp / (tp + fp + P) is reduced to
    nanos in DECIMAL(38,0). Ties break to the SMALLEST threshold
    (max-metric-then-min-threshold, two deterministic aggregates) so
    the result is bit-equal cross-engine. Degenerate inputs return
    zeros. Same two-phase cumulative shape as :func:`auc_report` —
    no corpus-grain total order."""
    cum = _cum_counts(scored, score_col, label_col, bucket_shift)
    tot = cum.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("P"),
        F.coalesce(F.sum("neg"), F.lit(0)).cast("long").alias("N"),
    )
    per_t = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        (F.col("P") - F.col("cumpos")).alias("tp"),
        (F.col("N") - F.col("cumneg")).alias("fp"),
        "P",
        "N",
    )
    metrics = per_t.select(
        "s",
        "tp",
        "fp",
        (F.col("tp") * F.col("N") - F.col("fp") * F.col("P")).alias("j"),
        _dec_div_nanos("2 * tp", "tp + fp + P").alias("f1"),
    )
    best = metrics.agg(
        F.count(F.lit(1)).cast("long").alias("n_thresholds"),
        F.coalesce(F.max("j"), F.lit(0)).cast("long").alias("youden_scaled"),
        F.coalesce(F.max("f1"), F.lit(0)).cast("long").alias("f1_best_nanos"),
    )
    picks = (
        metrics.crossJoin(F.broadcast(best))
        .agg(
            F.coalesce(
                F.min(F.when(F.col("j") == F.col("youden_scaled"), F.col("s"))),
                F.lit(0),
            )
            .cast("long")
            .alias("youden_score"),
            F.coalesce(
                F.min(F.when(F.col("f1") == F.col("f1_best_nanos"), F.col("s"))),
                F.lit(0),
            )
            .cast("long")
            .alias("f1_score"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("j") == F.col("youden_scaled"),
                        F.struct(F.negate(F.col("s")).alias("ns"), "tp", "fp"),
                    )
                ).getField("tp"),
                F.lit(0),
            )
            .cast("long")
            .alias("youden_tp"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("j") == F.col("youden_scaled"),
                        F.struct(F.negate(F.col("s")).alias("ns"), "tp", "fp"),
                    )
                ).getField("fp"),
                F.lit(0),
            )
            .cast("long")
            .alias("youden_fp"),
        )
    )
    return best.crossJoin(F.broadcast(picks)).select(
        "n_thresholds",
        "youden_scaled",
        "youden_score",
        "youden_tp",
        "youden_fp",
        "f1_best_nanos",
        "f1_score",
    )


def full_eval_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """AUC + KS + threshold selection FUSED over one cumulative pass.

    :func:`auc_report`, :func:`ks_report` and
    :func:`best_threshold_report` each reduce to per-score class
    counts with cumulatives — run separately they build the same
    two-phase cumulative three times. This computes the cumulative
    ONCE and derives every metric from it; each output column is
    bit-equal to its standalone counterpart (pinned in tests). One
    row: ``auc_num auc_den auc_nanos n_pos n_neg ks_num ks_den
    ks_nanos ks_score n_thresholds youden_scaled youden_score
    youden_tp youden_fp f1_best_nanos f1_score``.

    This is the serving shape for filter evaluation: at 100 TB the
    corpus-sized work (the per-score groupBy) happens once, and the
    metric algebra runs over the distinct-score frame once instead of
    three times."""
    per_score = (
        scored.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
    )
    return full_eval_from_counts(per_score, bucket_shift=bucket_shift)


def full_eval_from_counts(
    per_score: DataFrame,
    score_col: str = "s",
    pos_col: str = "pos",
    neg_col: str = "neg",
    bucket_shift: int = AUC_BUCKET_SHIFT,
) -> DataFrame:
    """:func:`full_eval_report` over pre-aggregated per-score class
    counts — the mergeable form (counts are additive), completing the
    streaming monitor: a drained count store serves AUC + KS +
    threshold selection in one pass. Duplicate score rows are
    re-aggregated first."""
    # r13 (guide §2.4): `cum` feeds both the totals row and the metric
    # frame — the lazy localCheckpoint pins the distinct-score frame so
    # the window subtree runs once instead of once per consumer.
    cum = _cum_from_counts(
        per_score.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(pos_col).cast("long").alias("pos"),
            F.col(neg_col).cast("long").alias("neg"),
        ),
        bucket_shift,
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("P"),
        F.coalesce(F.sum("neg"), F.lit(0)).cast("long").alias("N"),
    )
    m = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        "P",
        "N",
        (F.col("pos") * (F.lit(2) * F.col("cumneg") + F.col("neg"))).alias(
            "auc_term"
        ),
        F.abs(
            (F.col("cumpos") + F.col("pos")) * F.col("N")
            - (F.col("cumneg") + F.col("neg")) * F.col("P")
        ).alias("gap"),
        (F.col("P") - F.col("cumpos")).alias("tp"),
        (F.col("N") - F.col("cumneg")).alias("fp"),
    )
    m = m.select(
        "s",
        "P",
        "N",
        "auc_term",
        "gap",
        "tp",
        "fp",
        (F.col("tp") * F.col("N") - F.col("fp") * F.col("P")).alias("j"),
        _dec_div_nanos("2 * tp", "tp + fp + P").alias("f1"),
    )
    # r13 (guide §2.3/§2.4): the former shape aggregated `m` TWICE —
    # a `best` max/sum pass, then a `picks` argmin pass crossJoined
    # against it. The tie rule "min s among rows achieving the max" is
    # exactly a lexicographic struct max — max(struct(metric, -s, ...))
    # picks the max metric, then the max -s (= min s) among its ties,
    # and `s` is unique per row so the tie-row is unique — so the whole
    # report is ONE aggregation over ONE evaluation of `m`, bit-equal
    # column for column to the two-pass form.
    ns = F.negate(F.col("s")).alias("ns")
    one = m.agg(
        F.coalesce(F.sum("auc_term"), F.lit(0)).cast("long").alias("auc_num"),
        F.coalesce(F.max("P"), F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce(F.max("N"), F.lit(0)).cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_thresholds"),
        F.max(F.struct(F.col("gap"), ns)).alias("__ks"),
        F.max(F.struct(F.col("j"), ns, F.col("tp"), F.col("fp"))).alias("__yj"),
        F.max(F.struct(F.col("f1"), ns)).alias("__f1"),
    )
    best = one.select(
        "auc_num",
        "n_pos",
        "n_neg",
        "n_thresholds",
        F.coalesce(F.col("__ks").getField("gap"), F.lit(0))
        .cast("long")
        .alias("ks_num"),
        F.coalesce(-F.col("__ks").getField("ns"), F.lit(0))
        .cast("long")
        .alias("ks_score"),
        F.coalesce(F.col("__yj").getField("j"), F.lit(0))
        .cast("long")
        .alias("youden_scaled"),
        F.coalesce(-F.col("__yj").getField("ns"), F.lit(0))
        .cast("long")
        .alias("youden_score"),
        F.coalesce(F.col("__yj").getField("tp"), F.lit(0))
        .cast("long")
        .alias("youden_tp"),
        F.coalesce(F.col("__yj").getField("fp"), F.lit(0))
        .cast("long")
        .alias("youden_fp"),
        F.coalesce(F.col("__f1").getField("f1"), F.lit(0))
        .cast("long")
        .alias("f1_best_nanos"),
        F.coalesce(-F.col("__f1").getField("ns"), F.lit(0))
        .cast("long")
        .alias("f1_score"),
    )
    return best.select(
        "auc_num",
        (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            _dec_div_nanos("auc_num", "2 * n_pos * n_neg"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("auc_nanos"),
        "n_pos",
        "n_neg",
        "ks_num",
        (F.col("n_pos") * F.col("n_neg")).cast("long").alias("ks_den"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            _dec_div_nanos("ks_num", "n_pos * n_neg"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ks_nanos"),
        "ks_score",
        "n_thresholds",
        "youden_scaled",
        "youden_score",
        "youden_tp",
        "youden_fp",
        "f1_best_nanos",
        "f1_score",
    )


def confusion_report(
    scored: DataFrame, pred_col: str = "predicted", label_col: str = "label"
) -> DataFrame:
    """One exact row of confusion counts and nano-scaled rates:
    ``tp fp tn fn`` plus ``precision_nanos recall_nanos f1_nanos
    accuracy_nanos`` (floor(rate * 1e9), 0 when the denominator is 0).
    One scan, one aggregate — mergeable across shards by summing the
    counts and re-deriving the rates."""
    p = F.col(pred_col).cast("long")
    y = F.col(label_col).cast("long")
    agg = scored.agg(
        F.coalesce(F.sum(p * y), F.lit(0)).cast("long").alias("tp"),
        F.coalesce(F.sum(p * (1 - y)), F.lit(0)).cast("long").alias("fp"),
        F.coalesce(F.sum((1 - p) * y), F.lit(0)).cast("long").alias("fn"),
        F.coalesce(F.sum((1 - p) * (1 - y)), F.lit(0)).cast("long").alias("tn"),
    )
    def _rate(num: str, den: str, name: str):
        return (
            F.when(F.expr(den) > 0, _dec_div_nanos(num, den))
            .otherwise(F.lit(0))
            .cast("long")
            .alias(name)
        )

    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        _rate("tp", "tp + fp", "precision_nanos"),
        _rate("tp", "tp + fn", "recall_nanos"),
        _rate("2 * tp", "2 * tp + fp + fn", "f1_nanos"),
        _rate("tp + tn", "tp + fp + tn + fn", "accuracy_nanos"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (r11): turn a filter's raw scores into
# calibrated P(label=1 | score) — monotone regression, the standard
# post-hoc calibration for quality classifiers (Zadrozny & Elkan
# 2002). Computed EXACTLY, distributed, with no PAVA recursion: on
# (score-bin, pos, n) totals the isotonic fit has the closed minimax
# form
#
#     g(i) = max_{j<=i} min_{k>=j} mean(pos rate over bins j..k)
#
# (Robertson-Wright-Dykstra 1988, the minimax characterization of
# the PAVA solution). Bin totals are a BOUNDED frame (n_bins rows —
# the documented bounded-aggregate exception), so the B^2 interval
# enumeration and both optimizing passes never touch corpus-grain
# data; the only corpus-sized work is the one binning aggregation.
# Interval means are nano-floored via the DECIMAL(38,0) division
# (bit-equal to DuckDB HUGEINT //) — and because floor commutes with
# both min and max, max_j min_k floor(mean * 1e9) ==
# floor((max_j min_k mean) * 1e9): the output is EXACTLY the
# nano-floor of the true rational PAVA fit, not an approximation
# (pinned against an exact-Fraction PAVA mirror in
# tests/test_evaluation.py).
# ---------------------------------------------------------------------------


def _guarded_long(col, what: str):
    """Loud NULL guard (r11 advice): a NULL (or non-castable) score
    yields a NULL bin_idx row that survives the groupBy and sorts
    FIRST in the bin-ordered cumulative windows, silently skewing the
    PAVA fit — while the serving map-back join then silently drops
    the row. Fused into the projection so Catalyst cannot prune it;
    cost is one null-check per row."""
    c = col.cast("long")
    return F.when(
        c.isNull(),
        F.raise_error(
            F.lit(
                f"{what}: NULL or non-numeric value — filter or impute"
                " upstream before calibration"
            )
        ),
    ).otherwise(c)


def isotonic_calibrate_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 32,
) -> DataFrame:
    """(bin_idx, bin_lo, n, pos, cal_nanos) for every NON-EMPTY
    equal-width score bin, ``cal_nanos`` the isotonic-calibrated
    positive rate in integer nanos — non-decreasing in the bin index
    by construction. Bin edges derive from the observed integer
    score min/max (deterministic, replayable); a constant score
    column lands everything in bin 0. Empty input returns no rows.

    Envelope: the integer binning computes ``(s - lo) * n_bins`` in
    LONG, so ``(max score - min score) * n_bins`` must stay under
    2^63 — nano-scaled scores spanning ±1e15 at 32 bins are 6.4e16,
    fine; pre-scale wider domains (applies to the grouped and
    from-counts variants too)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    base = scored.select(
        _guarded_long(F.col(score_col), "isotonic_calibrate_bins score").alias("s"),
        _guarded_long(F.col(label_col), "isotonic_calibrate_bins label").alias("y"),
    )
    rng = base.agg(
        F.min("s").alias("__lo"), F.max("s").alias("__hi")
    )
    # integer bin: (s - lo) * B DIV (hi - lo + 1) — exact LONG math,
    # every value in [0, B-1]
    binned = (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.expr(
                f"(s - __lo) * {n_bins} DIV (__hi - __lo + 1)"
            ).alias("bin_idx"),
            "s",
            "y",
        )
        .groupBy("bin_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
            F.min("s").cast("long").alias("bin_lo"),
        )
    )
    # everything below runs on <= n_bins rows
    return _isotonic_from_binned(binned)


def calibration_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 32,
) -> DataFrame:
    """One exact-LONG row summarizing the isotonic fit: non-empty bin
    count, min/max calibrated values, a rank-weighted fingerprint,
    and two earned invariants — the fit is monotone non-decreasing
    and mass-conserving (sum of cal * n == total positives at nano
    resolution, PAVA's defining property, within n_bins nanos of
    snap error)."""
    bins = isotonic_calibrate_bins(scored, score_col, label_col, n_bins)
    w = Window.orderBy("bin_idx")
    with_prev = bins.select(
        "*",
        F.lag("cal_nanos").over(w).alias("__prev"),
        F.row_number().over(w).alias("__r"),
    )
    return with_prev.agg(
        F.count(F.lit(1)).cast("long").alias("cal_bins"),
        F.coalesce(F.min("cal_nanos"), F.lit(0)).cast("long").alias(
            "cal_min_nanos"
        ),
        F.coalesce(F.max("cal_nanos"), F.lit(0)).cast("long").alias(
            "cal_max_nanos"
        ),
        F.coalesce(F.sum(F.col("__r") * F.col("cal_nanos")), F.lit(0))
        .cast("long")
        .alias("cal_fp"),
        F.coalesce(
            F.min(
                (F.col("__prev").isNull())
                | (F.col("cal_nanos") >= F.col("__prev"))
            ),
            F.lit(True),
        ).alias("cal_monotone_ok"),
        (
            F.abs(
                F.coalesce(F.sum(F.col("cal_nanos") * F.col("n")), F.lit(0))
                - F.coalesce(F.sum("pos"), F.lit(0))
                * F.lit(1_000_000_000)
            )
            <= F.coalesce(F.sum("n"), F.lit(0))
        ).alias("cal_mass_ok"),
    )


def isotonic_calibrate_from_counts(
    per_score: DataFrame,
    score_col: str = "s",
    pos_col: str = "pos",
    neg_col: str = "neg",
    n_bins: int = 32,
) -> DataFrame:
    """:func:`isotonic_calibrate_bins` over PRE-AGGREGATED per-score
    class counts — the mergeable form (counts are additive), so the
    streaming monitor's drained count store serves a calibration
    curve with no raw-score re-read. Duplicate score rows are
    re-aggregated first; zero-net scores are invisible (the
    _cum_from_counts discipline). Bit-equal to running
    :func:`isotonic_calibrate_bins` on the raw rows (pinned)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    base = _counts_base(per_score, score_col, pos_col, neg_col, "isotonic_calibrate_from_counts")
    rng = base.agg(F.min("s").alias("__lo"), F.max("s").alias("__hi"))
    return _isotonic_from_binned(_bin_counts(base, rng, n_bins))


def _counts_base(per_score, score_col, pos_col, neg_col, what):
    """Normalized (s, pos, neg) count frame: guarded casts, duplicate
    scores re-aggregated, zero-net scores invisible (the
    _cum_from_counts discipline). Shared by the from-counts fit and
    the count-space serving half so both derive IDENTICAL bin edges."""
    return (
        per_score.select(
            _guarded_long(F.col(score_col), f"{what} score").alias("s"),
            _guarded_long(F.col(pos_col), f"{what} pos").alias("pos"),
            _guarded_long(F.col(neg_col), f"{what} neg").alias("neg"),
        )
        .groupBy("s")
        .agg(
            F.sum("pos").cast("long").alias("pos"),
            F.sum("neg").cast("long").alias("neg"),
        )
        .where((F.col("pos") + F.col("neg")) > 0)
        # r13 (guide §2.4): every caller consumes this frame at least
        # twice (range row + binning, and calibrate_counts a third
        # time for the map-back) — pin the distinct-score frame so the
        # upstream aggregation runs once
        .localCheckpoint(eager=False)
    )


def _bin_counts(base, rng, n_bins: int):
    """(bin_idx, bin_lo, n, pos) bin totals from a normalized count
    frame — the exact-LONG equal-width binning every calibration
    variant shares."""
    return (
        base.crossJoin(F.broadcast(rng))
        .select(
            F.expr(
                f"(s - __lo) * {n_bins} DIV (__hi - __lo + 1)"
            ).alias("bin_idx"),
            "s",
            "pos",
            "neg",
        )
        .groupBy("bin_idx")
        .agg(
            F.sum(F.col("pos") + F.col("neg")).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("pos"),
            F.min("s").cast("long").alias("bin_lo"),
        )
    )


def calibrate_counts(
    per_score: DataFrame,
    score_col: str = "s",
    pos_col: str = "pos",
    neg_col: str = "neg",
    n_bins: int = 32,
) -> DataFrame:
    """The serving half in COUNT space (r12, r11 verdict #5): map
    every distinct score through the isotonic curve fitted on the
    same per-score class counts — (s, pos, neg, n_rows, cal_nanos).
    Count-space twin of :func:`calibrate_scores`: the calibrated
    value per score is bit-equal to fitting + applying on the
    row-grain input (pinned in tests/test_streaming_eval.py), but it
    reads ONLY the mergeable count store — the streaming monitor's
    serve path, no raw-score re-read."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    base = _counts_base(per_score, score_col, pos_col, neg_col, "calibrate_counts")
    rng = base.agg(F.min("s").alias("__lo"), F.max("s").alias("__hi"))
    curve = _isotonic_from_binned(_bin_counts(base, rng, n_bins)).select(
        "bin_idx", "cal_nanos"
    )
    return (
        base.crossJoin(F.broadcast(rng))
        .withColumn(
            "bin_idx",
            F.expr(f"(s - __lo) * {n_bins} DIV (__hi - __lo + 1)"),
        )
        .join(F.broadcast(curve), "bin_idx")
        .select(
            "s",
            "pos",
            "neg",
            (F.col("pos") + F.col("neg")).cast("long").alias("n_rows"),
            "cal_nanos",
        )
    )


def calibrated_drift_from_counts(
    counts: DataFrame,
    group_col: str = "batch_key",
    score_col: str = "s",
    pos_col: str = "pos",
    neg_col: str = "neg",
    n_bins: int = 32,
    psi_bins: int | None = None,
    alpha: float | None = None,
) -> DataFrame:
    """The production monitoring loop (r11 verdict #5), entirely in
    count space: fit the isotonic curve on the CUMULATIVE per-score
    class counts, map every (group, score) count through it, and PSI
    each group's CALIBRATED-score distribution against the cumulative
    one — (group, n, psi_nanos). A drifting group (a micro-batch
    whose calibrated P(label=1) mix has moved) surfaces as a high
    psi_nanos without any raw-score re-read: score → calibrate →
    monitor, all served from the mergeable store."""
    from .divergence import PSI_ALPHA, PSI_BINS, psi_from_group_counts

    psi_bins = PSI_BINS if psi_bins is None else psi_bins
    alpha = PSI_ALPHA if alpha is None else alpha
    cal = calibrate_counts(
        counts, score_col, pos_col, neg_col, n_bins
    ).select("s", "cal_nanos")
    per_group = (
        counts.select(
            F.col(group_col).alias("__g"),
            _guarded_long(
                F.col(score_col), "calibrated_drift_from_counts score"
            ).alias("s"),
            # NULL counts raise (matching _counts_base) instead of
            # making __c NULL and silently vanishing at the > 0 filter
            (
                _guarded_long(
                    F.col(pos_col), "calibrated_drift_from_counts pos"
                )
                + _guarded_long(
                    F.col(neg_col), "calibrated_drift_from_counts neg"
                )
            ).alias("__c"),
        )
        .groupBy("__g", "s")
        .agg(F.sum("__c").cast("long").alias("__c"))
        .where(F.col("__c") > 0)
    )
    joined = per_group.join(cal, "s").select(
        F.col("__g").alias(group_col), "cal_nanos", "__c"
    )
    return psi_from_group_counts(
        joined, group_col, "cal_nanos", "__c", psi_bins, alpha
    )


def _isotonic_from_binned(binned: DataFrame) -> DataFrame:
    """Shared minimax tail over a (bin_idx, bin_lo, n, pos) frame.

    r13 (guide §2.4/§5): ``cum`` is consumed THREE times (the j side,
    the k side, and the final map-back join) — without a lineage cut
    each consumer re-ran the whole corpus-sized binning subtree, so
    the fit cost three corpus passes instead of one. The lazy
    localCheckpoint pins the <= n_bins-row frame after its first
    materialization. The j x k interval join and the map-back join
    are over <= n_bins rows on each side — broadcast them so the
    non-equi join plans as BroadcastNestedLoopJoin instead of a
    CartesianProduct (which multiplies task counts by the partition
    product) and the map-back needs no shuffle."""
    w_cum = Window.orderBy("bin_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = binned.select(
        "bin_idx",
        "bin_lo",
        "n",
        "pos",
        F.sum("n").over(w_cum).alias("cumn"),
        F.sum("pos").over(w_cum).alias("cumpos"),
        F.row_number().over(Window.orderBy("bin_idx")).alias("__i"),
    ).localCheckpoint(eager=False)
    j = cum.select(
        F.col("__i").alias("__j"),
        (F.col("cumn") - F.col("n")).alias("__nbefore"),
        (F.col("cumpos") - F.col("pos")).alias("__pbefore"),
    )
    k = cum.select(
        F.col("__i").alias("__k"),
        F.col("cumn").alias("__nthru"),
        F.col("cumpos").alias("__pthru"),
    )
    intervals = j.join(F.broadcast(k), F.col("__j") <= F.col("__k")).select(
        "__j",
        _dec_div_nanos(
            "__pthru - __pbefore", "__nthru - __nbefore"
        ).alias("__mean_nanos"),
    )
    inner = intervals.groupBy("__j").agg(
        F.min("__mean_nanos").alias("__inner")
    )
    w_run = Window.orderBy("__j").rowsBetween(Window.unboundedPreceding, 0)
    outer = inner.select(
        "__j", F.max("__inner").over(w_run).alias("cal_nanos")
    )
    return (
        cum.join(F.broadcast(outer), cum["__i"] == outer["__j"])
        .select("bin_idx", "bin_lo", "n", "pos", "cal_nanos")
    )


def calibrate_scores(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 32,
) -> DataFrame:
    """The serving half: fit the isotonic curve and map every row's
    raw score through it — input columns plus ``cal_nanos``, the
    calibrated P(label=1) in integer nanos (monotone in the score).
    The fit is a bounded frame, so the map-back is one broadcast join
    on the bin index; two corpus passes total (bin totals + apply).
    Rows tied to the fit's own training data — for held-out
    calibration, fit on one split via :func:`isotonic_calibrate_bins`
    and join its (bounded) output yourself."""
    base = scored.withColumn("__s", F.col(score_col).cast("long"))
    rng = base.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    bins = isotonic_calibrate_bins(
        scored, score_col, label_col, n_bins
    ).select("bin_idx", "cal_nanos")
    return (
        base.crossJoin(F.broadcast(rng))
        .withColumn(
            "bin_idx",
            F.expr(f"(__s - __lo) * {n_bins} DIV (__hi - __lo + 1)"),
        )
        .join(F.broadcast(bins), "bin_idx")
        .drop("bin_idx", "__s", "__lo", "__hi")
    )


def grouped_isotonic_calibrate(
    scored: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 32,
) -> DataFrame:
    """Per-group isotonic calibration — one fitted curve per distinct
    ``group_cols`` value (per-source calibration: the same raw score
    can mean different things on different slices), with the same
    (bin_idx, bin_lo, n, pos, cal_nanos) columns as
    :func:`isotonic_calibrate_bins` plus the group columns. Bin edges
    derive from each group's OWN score min/max.

    Plan shape mirrors :func:`grouped_auc_report`: every window is
    PARTITIONED by the group, the interval enumeration is a
    group-equijoined self-join of the per-group bin totals (groups ×
    B² rows, never corpus-grain), and there is no globally-ordered
    window anywhere — the operator scales with groups × bins."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    g = [F.col(c) for c in group_cols]
    base = scored.select(
        *g,
        _guarded_long(
            F.col(score_col), "grouped_isotonic_calibrate score"
        ).alias("s"),
        _guarded_long(
            F.col(label_col), "grouped_isotonic_calibrate label"
        ).alias("y"),
    )
    rng = base.groupBy(*group_cols).agg(
        F.min("s").alias("__lo"), F.max("s").alias("__hi")
    )
    binned = (
        base.join(rng, group_cols)
        .select(
            *g,
            F.expr(
                f"(s - __lo) * {n_bins} DIV (__hi - __lo + 1)"
            ).alias("bin_idx"),
            "s",
            "y",
        )
        .groupBy(*group_cols, "bin_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
            F.min("s").cast("long").alias("bin_lo"),
        )
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.select(
        *g,
        "bin_idx",
        "bin_lo",
        "n",
        "pos",
        F.sum("n").over(w_cum).alias("cumn"),
        F.sum("pos").over(w_cum).alias("cumpos"),
        F.row_number()
        .over(Window.partitionBy(*group_cols).orderBy("bin_idx"))
        .alias("__i"),
    )
    j = cum.select(
        *g,
        F.col("__i").alias("__j"),
        (F.col("cumn") - F.col("n")).alias("__nbefore"),
        (F.col("cumpos") - F.col("pos")).alias("__pbefore"),
    )
    k = cum.select(
        *g,
        F.col("__i").alias("__k"),
        F.col("cumn").alias("__nthru"),
        F.col("cumpos").alias("__pthru"),
    )
    intervals = j.join(
        k, [*group_cols], "inner"
    ).where(F.col("__j") <= F.col("__k")).select(
        *g,
        "__j",
        _dec_div_nanos(
            "__pthru - __pbefore", "__nthru - __nbefore"
        ).alias("__mean_nanos"),
    )
    inner = intervals.groupBy(*group_cols, "__j").agg(
        F.min("__mean_nanos").alias("__inner")
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy("__j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    outer = inner.select(
        *g,
        F.col("__j").alias("__i"),
        F.max("__inner").over(w_run).alias("cal_nanos"),
    )
    return cum.join(outer, [*group_cols, "__i"]).select(
        *g, "bin_idx", "bin_lo", "n", "pos", "cal_nanos"
    )
