"""From-scratch multinomial Naive-Bayes document classifier — the
quality-filter workhorse of LLM data pipelines (the CCNet /
fastText-style keep-vs-drop filter, re-expressed as pure DataFrame
algebra so both training and scoring are exact, portable SQL).

No MLlib, no UDFs, no iterative optimizer: multinomial NB with
Laplace smoothing has a CLOSED-FORM maximum-likelihood fit —
per-class token counts and document priors — so the entire train +
score path is groupBy/join/sum over built-in columns, replayable
bit-for-bit in DuckDB (the oracle does exactly that).

Math (binary labels 0/1, Laplace smoothing alpha):

    ll_L(t)   = ln(count_L(t) + alpha) - ln(total_L + alpha * V)
    fb_L      = ln(alpha)              - ln(total_L + alpha * V)
    prior_L   = ln(n_docs_L) - ln(n_docs)
    score_L(d)= prior_L + sum over token occurrences of ll_L(t)
                (unseen tokens contribute fb_L)

Every per-term log-likelihood is snapped to the 1e-6 grid
(functions/numeric.py) BEFORE summation, so per-document sums are
order-invariant and engine-identical; per-document scores and the
margin snap to the 1e-2 grid, making the argmax (``predicted``)
deterministic across engines. Ties (margin == 0.0) break to class 0.

Scale shape (the 100 TB story): the model is VOCABULARY-sized —
orders of magnitude smaller than the corpus — so training is one
corpus scan into a partial-aggregated (term)-keyed count (map-side
combine carries most of the reduction) plus two scalar aggregates,
and scoring is one corpus scan + one BROADCAST join against the term
table + one doc-keyed sum. One shuffle at doc grain, no Cartesian,
no Python. Requires at least one training document in each class
(ln(0) otherwise); callers validate upstream.

Reference parity: the reference repo
(italovinicius18/lakehouse-file-format-compare) has no classifier —
this is part of the beyond-reference LLM-pipeline surface the brief
mandates, alongside dedup/decontamination/ranking.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import grid

TOKEN_SPLIT_RE = r"\s+"


class NBModel(NamedTuple):
    """A fitted model: ``terms`` is (term, ll0, ll1) — one row per
    distinct training token; ``meta`` is a single row
    (prior0, prior1, fb0, fb1, vocab, train_docs). Both are small
    (vocabulary-sized / scalar) and broadcast at scoring time."""

    terms: DataFrame
    meta: DataFrame


def _tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )


def nb_train(
    train: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> NBModel:
    """Fit the closed-form multinomial NB model. ``label_col`` must
    be 0/1 (cast to int upstream); ``alpha`` > 0."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    occ = train.select(
        F.col(label_col).cast("int").alias("label"),
        F.explode(_tokens(text_col)).alias("term"),
    )
    cnt = occ.groupBy("term").agg(
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("c1"),
    )
    tot = cnt.groupBy().agg(
        F.coalesce(F.sum("c0"), F.lit(0)).alias("tot0"),
        F.coalesce(F.sum("c1"), F.lit(0)).alias("tot1"),
        F.count(F.lit(1)).alias("vocab"),
    )
    nd = train.groupBy().agg(
        F.coalesce(
            F.sum(F.when(F.col(label_col).cast("int") == 0, 1).otherwise(0)),
            F.lit(0),
        ).alias("nd0"),
        F.coalesce(
            F.sum(F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)),
            F.lit(0),
        ).alias("nd1"),
        F.count(F.lit(1)).alias("train_docs"),
    )
    a = F.lit(float(alpha))
    meta = tot.crossJoin(F.broadcast(nd)).select(
        grid(F.log(F.col("nd0").cast("double")) - F.log(F.col("train_docs").cast("double")), 6).alias("prior0"),
        grid(F.log(F.col("nd1").cast("double")) - F.log(F.col("train_docs").cast("double")), 6).alias("prior1"),
        grid(F.log(a) - F.log(F.col("tot0") + a * F.col("vocab")), 6).alias("fb0"),
        grid(F.log(a) - F.log(F.col("tot1") + a * F.col("vocab")), 6).alias("fb1"),
        F.col("vocab"),
        F.col("train_docs"),
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        grid(F.log(F.col("c0") + a) - F.log(F.col("tot0") + a * F.col("vocab")), 6).alias("ll0"),
        grid(F.log(F.col("c1") + a) - F.log(F.col("tot1") + a * F.col("vocab")), 6).alias("ll1"),
    )
    return NBModel(terms=terms, meta=meta)


def nb_score(
    model: NBModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a fitted model.

    Returns (doc_id, score0, score1, margin, predicted):
    ``score_L`` is the grid-2-snapped class log-posterior,
    ``margin`` = grid-2(score1_raw - score0_raw) and ``predicted`` =
    1 iff margin > 0 (ties to 0). Zero-token documents score on the
    priors alone (``explode_outer`` keeps them).
    """
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_tokens(text_col)).alias("term"),
    )
    joined = occ.join(F.broadcast(model.terms), "term", "left").crossJoin(
        F.broadcast(model.meta)
    )
    c0 = F.when(F.col("term").isNull(), F.lit(0.0)).otherwise(
        F.coalesce(F.col("ll0"), F.col("fb0"))
    )
    c1 = F.when(F.col("term").isNull(), F.lit(0.0)).otherwise(
        F.coalesce(F.col("ll1"), F.col("fb1"))
    )
    per_doc = joined.groupBy("doc_id").agg(
        (F.sum(c0) + F.first("prior0")).alias("s0"),
        (F.sum(c1) + F.first("prior1")).alias("s1"),
    )
    return per_doc.select(
        "doc_id",
        grid(F.col("s0"), 2).alias("score0"),
        grid(F.col("s1"), 2).alias("score1"),
        grid(F.col("s1") - F.col("s0"), 2).alias("margin"),
        (grid(F.col("s1") - F.col("s0"), 2) > 0).cast("int").alias("predicted"),
    )
