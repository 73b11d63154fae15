"""DSIR-style importance resampling (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023 — a public
method): select corpus documents whose hashed n-gram distribution
looks like a TARGET domain, by ranking on the importance weight

    w(doc) = log p_target(doc) - log p_raw(doc)

under bag-of-hashed-ngrams multinomial models with Laplace smoothing.
This is the data-SELECTION companion to the quality classifier
(operators/classify.py): where NB filters on a learned label, DSIR
shifts the corpus mixture toward a target domain given only an
exemplar sample of it — the method behind domain-balanced LLM
pretraining mixes.

Everything is closed-form DataFrame algebra, replayable bit-for-bit
in DuckDB:

- Feature hashing uses the engine-portable md5 bucket (same idiom as
  the Count-Min sketch, operators/sketches.py::_cms_bucket): first 8
  hex chars of md5(tag|token) as an integer mod ``n_buckets`` —
  Spark's ``conv(hex,16,10)`` and DuckDB's ``CAST('0x'||hex AS
  BIGINT)`` agree exactly.
- Per-bucket log-likelihood ratios are snapped to the 1e-6 grid
  BEFORE the per-document sum (the classify.py pattern), so document
  weights are order-invariant and engine-identical; the final weight
  snaps to the 1e-2 grid.
- Selection is the deterministic rank variant: top-k by
  (weight DESC, doc_id ASC). The paper's Gumbel-noise sampling adds
  variance for diversity; rank selection keeps the contract exact —
  callers wanting sampled selection can add a keyed-hash jitter
  column upstream (operators/sampling.py has the keyed-uniform
  machinery).

Scale shape (the 100 TB story): both domain profiles are
BUCKET-sized aggregates (``n_buckets`` is a fixed constant — map-side
combine carries the reduction, output fits in one broadcast);
scoring is one corpus scan + one broadcast join against the
bucket-ratio table + one doc-keyed partial sum (one shuffle at doc
grain); selection is a global top-k, which Spark executes as
TakeOrderedAndProject — a per-partition heap + driver merge of k
rows, never a full sort shuffle. No Python, no Cartesian, no
unbounded state.

Reference parity: the reference repo
(italovinicius18/lakehouse-file-format-compare) has no data-selection
surface; beyond-reference LLM-pipeline extension mandated by the
brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import grid

DEFAULT_BUCKETS = 256


def _tokens(text_col: str) -> F.Column:
    # same tokenizer as the NB classifier (classify.py): lowercase
    # whitespace split, empties dropped
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def _bucket(col: F.Column, n_buckets: int, tag: str) -> F.Column:
    """Engine-portable hash bucket: md5(tag|token) first 8 hex chars
    as an integer mod n_buckets (sketches.py::_cms_bucket idiom)."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(tag), col)), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    )


def hashed_profile(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    tag: str = "dsir",
) -> DataFrame:
    """Bag-of-hashed-tokens domain profile: (bucket, cnt). One scan,
    bucket-sized output."""
    return (
        docs.select(F.explode(_tokens(text_col)).alias("__tok"))
        .select(_bucket(F.col("__tok"), n_buckets, tag).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    tag: str = "dsir",
) -> DataFrame:
    """Per-document importance weight under hashed-unigram models.

    Returns (doc_id, n_tokens, weight): weight = grid-2 of the sum of
    grid-6 per-bucket log-ratios

        lam(b) = grid6(ln(ct_b + a) - ln(Tt + a*B))
               - grid6(ln(cr_b + a) - ln(Tr + a*B))

    where (ct, Tt) come from the target profile and (cr, Tr) from the
    corpus (raw) profile. Buckets unseen in a profile contribute its
    alpha fallback. Zero-token documents get weight 0.0.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    a = F.lit(float(alpha))
    b = F.lit(float(n_buckets))

    tp = hashed_profile(target, text_col=text_col, n_buckets=n_buckets, tag=tag)
    cp = hashed_profile(corpus, text_col=text_col, n_buckets=n_buckets, tag=tag)

    tt = tp.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("tt"))
    tr = cp.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("tr"))
    meta = tt.crossJoin(tr)

    # full outer on bucket: a bucket seen only in one profile still
    # gets the other side's alpha fallback
    ratios = (
        tp.withColumnRenamed("cnt", "ct")
        .join(cp.withColumnRenamed("cnt", "cr"), "bucket", "full_outer")
        .crossJoin(F.broadcast(meta))
        .select(
            "bucket",
            (
                grid(
                    F.log(F.coalesce(F.col("ct"), F.lit(0)) + a)
                    - F.log(F.col("tt") + a * b),
                    6,
                )
                - grid(
                    F.log(F.coalesce(F.col("cr"), F.lit(0)) + a)
                    - F.log(F.col("tr") + a * b),
                    6,
                )
            ).alias("lam"),
        )
    )
    # fallback for buckets in neither profile (possible when scoring
    # docs outside the profiled corpus)
    fb = meta.select(
        (
            grid(F.log(a) - F.log(F.col("tt") + a * b), 6)
            - grid(F.log(a) - F.log(F.col("tr") + a * b), 6)
        ).alias("fb_lam")
    )

    occ = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_tokens(text_col)).alias("__tok"),
    ).select(
        "doc_id",
        F.when(
            F.col("__tok").isNotNull(), _bucket(F.col("__tok"), n_buckets, tag)
        ).alias("bucket"),
    )
    joined = occ.join(F.broadcast(ratios), "bucket", "left").crossJoin(
        F.broadcast(fb)
    )
    contrib = F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
        F.coalesce(F.col("lam"), F.col("fb_lam"))
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.col("bucket")).alias("n_tokens"),
        grid(F.sum(contrib), 2).alias("weight"),
    )


def importance_resample(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    tag: str = "dsir",
) -> DataFrame:
    """Deterministic DSIR selection: the top-``k`` documents by
    (weight DESC, doc_id ASC). Returns (doc_id, n_tokens, weight).
    Plan: TakeOrderedAndProject over the weight frame — no global
    sort shuffle (plan-pinned in tests/test_importance.py)."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = importance_weights(
        corpus,
        target,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
        tag=tag,
    )
    return w.orderBy(F.col("weight").desc(), F.col("doc_id")).limit(int(k))


def greedy_coverage_selection(
    docs: DataFrame,
    k: int = 4,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[int, int, int, int]]:
    """Greedy facility-location selection by word n-gram coverage —
    the classic submodular data-selection primitive (Nemhauser 1978
    greedy on a coverage function; the diversity-driven counterpart to
    DSIR's distribution matching above): at each of ``k`` steps pick
    the document contributing the MOST n-grams not yet covered by the
    picks so far, ties to the smallest id. The (1 - 1/e) greedy
    guarantee holds because gram coverage is monotone submodular.

    Returns ``[(step, doc_id, new_grams, covered_total), ...]``
    (at most ``k`` entries — stops early when every remaining document
    adds nothing). Deterministic and exact: counts are integers and
    the per-step argmax breaks ties on the id.

    Scale shape (100 TB): the corpus is exploded into DISTINCT
    (doc, gram) pairs ONCE (lineage-cut so iterations never re-split
    text); each step is one anti-join against the covered-gram set
    (bounded by the selected docs' gram union, broadcast while small),
    one per-doc count, and a 1-row TakeOrderedAndProject argmax — a
    BOUNDED driver read per step (the k-means per-iteration collect
    discipline). The covered set is lazily checkpointed per step so
    the plan never grows with the step count. k is small by design
    (selection budgets are); for large k, batch the greedy (pick the
    top-b per round) — the standard lazy-greedy relaxation.
    """
    if k < 1 or n < 1:
        raise ValueError("k and n must be >= 1")
    toks = _tokens(text_col)
    staged = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    grams = (
        staged.where(F.size("__t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__t") - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i, n)),
                    )
                )
            ).alias("gram"),
        )
        .localCheckpoint(eager=False)
    )
    covered = None
    out: list[tuple[int, int, int, int]] = []
    total = 0
    for step in range(1, k + 1):
        remaining = (
            grams if covered is None else grams.join(covered, "gram", "left_anti")
        )
        top = (
            remaining.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("new_grams"))
            .orderBy(F.col("new_grams").desc(), F.col("doc_id"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["new_grams"] == 0:
            break
        doc_id, new_grams = int(top[0]["doc_id"]), int(top[0]["new_grams"])
        total += new_grams
        out.append((step, doc_id, new_grams, total))
        picked = grams.where(F.col("doc_id") == doc_id).select("gram")
        covered = (
            picked if covered is None else covered.union(picked).distinct()
        ).localCheckpoint(eager=False)
    return out
