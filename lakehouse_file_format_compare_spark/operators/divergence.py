"""Distribution-shift / divergence reporting between corpus slices
and the whole corpus — the mixture-calibration statistic a training-
data pipeline reads before choosing source weights, and the drift
statistic a production feed is monitored with (PSI).

Two reports:

- ``token_divergence_report``: per group (e.g. ``source``), the
  word-distribution divergence vs the full corpus — KL(P_g || Q),
  Jensen-Shannon, total variation, Pearson chi-square, coverage
  (corpus mass of the group's vocabulary) and the group's most
  distinctive word (argmax KL term).
- ``psi_report``: per group, the Population Stability Index of a
  numeric column vs the global distribution over B equal-width
  histogram bins (the industry drift metric; PSI > 0.2 is the usual
  "investigate" threshold).

Cross-engine exactness (the fixed-point discipline from
operators/pagerank.py): every per-word / per-bin term is snapped to
an integer number of NANO-units (``floor(term * 1e9 + 0.5)`` — pure
IEEE multiply/add/floor, bit-identical on Spark and DuckDB) and the
aggregation sums LONGs, so the result is exact and invariant to
partitioning and summation order. Only the final report columns
divide back to doubles. Chi-square terms (magnitude ~ n_g) use
MICRO-units so the long sum cannot overflow at realistic scales.

Scale shape (100 TB):
- the corpus is tokenized ONCE: one explode + one (group, word)
  count with map-side combine — the only corpus-sized shuffle;
- global word counts, per-group totals and the grand total are all
  re-aggregations of that vocabulary-sized count table, never a
  second corpus scan;
- the join of group-word counts to global word counts is
  vocabulary-bounded on both sides (AQE picks the strategy; at web
  scale both sides are Heaps-law-small relative to the corpus);
- per-group totals and the grand total ride broadcast joins;
- the only window (top distinctive word) partitions BY GROUP over
  the vocabulary-sized table — parallel, never single-task.
- PSI bins are computed with pure INTEGER arithmetic
  (``((x - mn) * B) div (mx - mn + 1)``), so bin assignment is exact
  on every engine, and the dense (group × B) grid is tiny.

Mathematical identities used so that only GROUP-vocabulary words are
ever materialized (words outside the group contribute closed-form
corrections via coverage ``cov = sum_{w in g} q_w``):
  TV  = 0.5 * (sum_{w in g} |p-q| + (1 - cov))
  JS  = sum_{w in g} [p/2 ln(2p/(p+q)) + q/2 ln(2q/(p+q))]
        + (ln 2)/2 * (1 - cov)
  chi2 = sum_{w in g} (c_gw - n_g q)^2/(n_g q) + n_g (1 - cov)

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no statistics surface (dags/ are format-comparison ETL);
extension surface per the training-data-pipeline brief (SURVEY §2
extensions — mixture calibration / data profiling family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NANO = 1_000_000_000
MICRO = 1_000_000

#: default histogram bins for PSI
PSI_BINS = 8
#: Laplace smoothing per PSI bin (keeps ln finite on empty bins)
PSI_ALPHA = 0.5


def _nano(col):
    return F.floor(col * NANO + F.lit(0.5)).cast("long")


def _micro(col):
    return F.floor(col * MICRO + F.lit(0.5)).cast("long")


def group_word_counts(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """(group, word, c) — the single corpus-sized pass everything
    else re-aggregates. Same tokenization as operators/vocab.py
    (lowercase, split on whitespace, drop empties)."""
    return (
        docs.select(
            F.col(group_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy(group_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def token_divergence_nanos(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group EXACT integer divergence partials — the mergeable
    form (`*_nanos`/`*_micros` LONG columns). ``token_divergence_report``
    turns these into the human-facing doubles; driver fingerprints sum
    them directly (long arithmetic end to end)."""
    gw = group_word_counts(docs, group_col, text_col)
    global_w = gw.groupBy("word").agg(F.sum("c").cast("long").alias("cw"))
    per_group = gw.groupBy(group_col).agg(
        F.sum("c").cast("long").alias("ng"),
        F.count(F.lit(1)).cast("long").alias("vocab_terms"),
    )
    grand = gw.agg(F.sum("c").cast("long").alias("nn"))

    joined = (
        gw.join(global_w, "word")
        .join(F.broadcast(per_group), group_col)
        .crossJoin(F.broadcast(grand))
    )
    p = F.col("c").cast("double") / F.col("ng")
    q = F.col("cw").cast("double") / F.col("nn")
    m = (p + q) / 2
    kl_t = _nano(p * F.log(p / q))
    js_t = _nano(p / 2 * F.log(p / m) + q / 2 * F.log(q / m))
    tv_t = _nano(F.abs(p - q))
    # Shannon entropy of the group's own word distribution (nats):
    # the corpus-diversity statistic mixture tuning reads next to KL
    ent_t = _nano(-(p * F.log(p)))
    chi_t = _micro(
        (F.col("c").cast("double") - F.col("ng") * q)
        * (F.col("c").cast("double") - F.col("ng") * q)
        / (F.col("ng") * q)
    )
    cov_t = _nano(q)

    terms = joined.select(
        group_col, "word", "ng", "vocab_terms",
        kl_t.alias("__kl"), js_t.alias("__js"), tv_t.alias("__tv"),
        chi_t.alias("__chi"), cov_t.alias("__cov"), ent_t.alias("__ent"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__kl").desc(), F.col("word")
    )
    return (
        terms.withColumn("__rn", F.row_number().over(w))
        .groupBy(group_col)
        .agg(
            F.max("ng").alias("n_tokens"),
            F.max("vocab_terms").alias("vocab_terms"),
            F.sum("__kl").cast("long").alias("kl_nanos"),
            F.sum("__js").cast("long").alias("js_nanos"),
            F.sum("__tv").cast("long").alias("tv_nanos"),
            F.sum("__chi").cast("long").alias("chi2_micros"),
            F.sum("__cov").cast("long").alias("cov_nanos"),
            F.sum("__ent").cast("long").alias("ent_nanos"),
            F.max(F.when(F.col("__rn") == 1, F.col("word"))).alias("top_word"),
        )
    )


def token_divergence_report(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group divergence vs the corpus, as doubles (grid-6; chi2
    grid-4). The out-of-vocabulary corrections (see module docstring)
    are applied here from the exact integer partials, so the report
    is still a pure function of the data."""
    from ..functions.numeric import grid

    part = token_divergence_nanos(docs, group_col, text_col)
    cov = F.col("cov_nanos") / NANO
    ln2 = F.log(F.lit(2.0))
    return part.select(
        group_col,
        "n_tokens",
        "vocab_terms",
        grid(cov, 6).alias("coverage"),
        grid(F.col("kl_nanos") / NANO, 6).alias("kl"),
        grid(F.col("js_nanos") / NANO + ln2 / 2 * (1 - cov), 6).alias("js"),
        grid((F.col("tv_nanos") / NANO + (1 - cov)) / 2, 6).alias("tv"),
        grid(
            F.col("chi2_micros") / MICRO + F.col("n_tokens") * (1 - cov), 4
        ).alias("chi2"),
        grid(F.col("ent_nanos") / NANO, 6).alias("entropy"),
        grid(F.col("vocab_terms") / F.col("n_tokens"), 6).alias("ttr"),
        "top_word",
    )


def psi_bin(value_col, mn_col, mx_col, n_bins: int):
    """Equal-width bin index in [0, n_bins) with PURE integer
    arithmetic — exact on every engine. The +1 span guard also
    handles the degenerate mn == mx table (everything lands in
    bin 0)."""
    return F.expr(
        f"(({value_col} - {mn_col}) * {n_bins}) div ({mx_col} - {mn_col} + 1)"
    )


def psi_nanos(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = PSI_BINS,
    alpha: float = PSI_ALPHA,
) -> DataFrame:
    """(group, n, psi_nanos) — exact integer PSI partial per group.
    Null values are excluded (both engines agree: a null has no bin).
    Delegates to the count-weighted form with unit weights."""
    return psi_from_group_counts(
        df.withColumn("__one", F.lit(1).cast("long")),
        group_col,
        value_col,
        "__one",
        n_bins,
        alpha,
    )


def psi_from_group_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str,
    n_bins: int = PSI_BINS,
    alpha: float = PSI_ALPHA,
) -> DataFrame:
    """(group, n, psi_nanos) from PRE-AGGREGATED (group, value, count)
    rows — the count-weighted twin of :func:`psi_nanos` (r12). Counts
    are additive, so a drained/mergeable count store serves the same
    exact PSI with no row-grain re-read (bit-equal pinned in
    tests/test_divergence.py); feeds the streaming monitor's
    calibrated-score drift (operators/evaluation.py::
    calibrated_drift_from_counts). Null values and non-positive
    counts are excluded."""
    base = df.where(
        F.col(value_col).isNotNull() & (F.col(count_col) > 0)
    ).select(
        F.col(group_col),
        F.col(value_col).cast("long").alias("__v"),
        F.col(count_col).cast("long").alias("__c"),
    )
    bounds = base.agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    )
    binned = base.crossJoin(F.broadcast(bounds)).select(
        group_col,
        psi_bin("__v", "__mn", "__mx", n_bins).alias("bin"),
        "__c",
    )
    gb = binned.groupBy(group_col, "bin").agg(
        F.sum("__c").cast("long").alias("c")
    )
    groups = gb.groupBy(group_col).agg(F.sum("c").cast("long").alias("n"))
    dense = groups.select(
        group_col, "n",
        F.explode(F.expr(f"sequence(0, {n_bins - 1})")).alias("bin"),
    ).join(gb, [group_col, "bin"], "left").fillna({"c": 0})
    global_b = gb.groupBy("bin").agg(F.sum("c").cast("long").alias("cb"))
    grand = gb.agg(F.sum("c").cast("long").alias("nn"))
    j = dense.join(F.broadcast(global_b), "bin").crossJoin(F.broadcast(grand))
    p = (F.col("c") + alpha) / (F.col("n") + alpha * n_bins)
    q = (F.col("cb") + alpha) / (F.col("nn") + alpha * n_bins)
    term = _nano((p - q) * F.log(p / q))
    return j.groupBy(group_col).agg(
        F.max("n").alias("n"),
        F.sum(term).cast("long").alias("psi_nanos"),
    )


def psi_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = PSI_BINS,
    alpha: float = PSI_ALPHA,
) -> DataFrame:
    """Per-group PSI of ``value_col`` vs the global distribution."""
    from ..functions.numeric import grid

    part = psi_nanos(df, group_col, value_col, n_bins, alpha)
    return part.select(
        group_col, "n", grid(F.col("psi_nanos") / NANO, 6).alias("psi")
    )


# ---------------------------------------------------------------------------
# Streaming drift monitor: per event-time window PSI vs a static
# baseline. The windowed bin-count stage is a plain
# window()+groupBy().count() — incremental under readStream +
# withWatermark (same expressions, two runners — the streaming_plans
# discipline); the PSI reduce runs over the drained counts. Bin
# edges come from the BASELINE (fixed before the stream starts — the
# production monitoring shape); stream values outside the baseline
# range clamp into the edge bins.
# ---------------------------------------------------------------------------

#: fixed-point scale for double-valued columns: exact integer cents
CENTS = 100


def _cents(col):
    return F.floor(col * CENTS + F.lit(0.5)).cast("long")


def baseline_histogram(
    baseline: DataFrame, value_col: str, n_bins: int = PSI_BINS
) -> tuple[DataFrame, DataFrame]:
    """(bounds, per-bin counts + total) of the static baseline, both
    tiny broadcast-ready frames. Values are snapped to integer cents
    so bin assignment stays pure integer arithmetic."""
    b = baseline.where(F.col(value_col).isNotNull()).select(
        _cents(F.col(value_col)).alias("__v")
    )
    bounds = b.agg(F.min("__v").alias("__mn"), F.max("__v").alias("__mx"))
    counts = (
        b.crossJoin(F.broadcast(bounds))
        .select(psi_bin("__v", "__mn", "__mx", n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    # densify: every bin exists (empty baseline bins still smooth)
    dense = (
        counts.sparkSession.range(n_bins)
        .select(F.col("id").cast("long").alias("bin"))
        .join(counts, "bin", "left")
        .fillna({"cb": 0})
    )
    total = counts.agg(F.sum("cb").cast("long").alias("nn"))
    return bounds, dense.crossJoin(F.broadcast(total))


def windowed_bin_counts(
    events: DataFrame,
    bounds: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    n_bins: int = PSI_BINS,
) -> DataFrame:
    """(window, bin, c) — the STREAMING-compatible stage: runs
    unchanged under readStream + withWatermark (append mode). Out-of-
    baseline-range values clamp to the edge bins so the stream can
    never crash the monitor."""
    raw = psi_bin("__v", "__mn", "__mx", n_bins)
    clamped = F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    )
    return (
        events.where(F.col(value_col).isNotNull())
        .select(
            F.col(ts_col), _cents(F.col(value_col)).alias("__v")
        )
        .crossJoin(F.broadcast(bounds))
        .select(F.col(ts_col), clamped.alias("bin"))
        .groupBy(F.window(ts_col, window_duration).alias("w"), F.col("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def psi_from_window_counts(
    wc: DataFrame,
    hist: DataFrame,
    n_bins: int = PSI_BINS,
    alpha: float = PSI_ALPHA,
) -> DataFrame:
    """Per-window PSI from drained (window, bin, c) counts against the
    baseline histogram — exact integer nanos, same term as psi_nanos.
    """
    from ..functions.numeric import grid

    wins = wc.groupBy("w").agg(F.sum("c").cast("long").alias("n"))
    # re-alias the count side: wins derives from wc, and a drained
    # memory-sink view would otherwise join against its own attributes
    counts = wc.select(
        F.col("w").alias("__cw"), F.col("bin").alias("__cbin"),
        F.col("c").alias("c"),
    )
    dense = (
        wins.select(
            "w", "n",
            F.explode(F.expr(f"sequence(0, {n_bins - 1})")).alias("bin"),
        )
        .join(
            counts,
            (F.col("w") == F.col("__cw")) & (F.col("bin") == F.col("__cbin")),
            "left",
        )
        .drop("__cw", "__cbin")
        .fillna({"c": 0})
    )
    j = dense.join(F.broadcast(hist), "bin")
    p = (F.col("c") + alpha) / (F.col("n") + alpha * n_bins)
    q = (F.col("cb") + alpha) / (F.col("nn") + alpha * n_bins)
    term = _nano((p - q) * F.log(p / q))
    return (
        j.groupBy("w")
        .agg(
            F.max("n").alias("n"),
            F.sum(term).cast("long").alias("psi_nanos"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "psi_nanos",
            grid(F.col("psi_nanos") / NANO, 6).alias("psi"),
        )
    )


def windowed_psi_vs_baseline(
    events: DataFrame,
    baseline: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    n_bins: int = PSI_BINS,
    alpha: float = PSI_ALPHA,
) -> DataFrame:
    """Batch view of the drift monitor: per event-time window, the
    PSI of ``value_col`` against the static baseline distribution."""
    bounds, hist = baseline_histogram(baseline, value_col, n_bins)
    wc = windowed_bin_counts(
        events, bounds, value_col, ts_col, window_duration, n_bins
    )
    return psi_from_window_counts(wc, hist, n_bins, alpha)
