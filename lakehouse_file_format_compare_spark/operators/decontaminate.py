"""Benchmark decontamination: find training documents sharing long
word n-grams with an evaluation set (the standard 13-gram overlap
test from the GPT-3/PaLM appendices; n is a dial).

Asymmetric by design — the eval side is benchmark-sized (thousands of
rows), the corpus side is the 100 TB side. Plan shape: explode both
sides to distinct n-grams, hash-join on the n-gram, count matches per
(doc, eval) pair. The eval n-gram set is TINY, so it broadcasts: the
corpus is scanned once, never shuffled on document identity until the
per-pair count (whose input is only the matching grams). A corpus doc
with ANY hit is flagged; `decontaminate` drops flagged docs with a
left-anti join.

Reuses the same tokenize-lower-split convention as
functions/text.py / operators/ranking.py so the three surfaces agree
on token identity. Exact DuckDB oracle: tests/test_decontaminate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_set(docs: DataFrame, n: int, id_col: str, text_col: str, out_id: str) -> DataFrame:
    """(out_id, ngram) — DISTINCT word n-grams per document.

    The token array is pinned in its own projection before the gram
    transform consumes it: expressions referenced inside higher-order
    lambdas re-evaluate per element (no CSE inside lambdas), so an
    unstaged ``slice(toks, i, n)`` would re-split the whole document
    once per gram (measured ~5x on this op at sf0.1, PROFILE_r05.md).
    """
    staged = docs.select(
        F.col(id_col).alias(out_id),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(out_id, F.explode(grams).alias("ngram"))


def ngram_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, shared_ngrams): corpus x eval pairs sharing at
    least one word n-gram. The eval n-gram side is broadcast — the
    corpus side streams through one scan + one pair-count aggregate."""
    c = _ngram_set(corpus, n, id_col, text_col, "doc_id")
    e = _ngram_set(eval_docs, n, eval_id_col, eval_text_col, "eval_id")
    return (
        c.join(F.broadcast(e), "ngram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents with >= min_shared n-gram overlaps with
    ANY eval document (left-anti join on the flagged id set)."""
    flagged = (
        ngram_contamination(
            corpus, eval_docs, n, id_col, text_col, eval_id_col, eval_text_col
        )
        .groupBy("doc_id")
        .agg(F.sum("shared_ngrams").alias("total_shared"))
        .where(F.col("total_shared") >= min_shared)
        .select("doc_id")
    )
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def _cross_shingles(corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col):
    from .dedup import _shingle_pairs

    c_sh = _shingle_pairs(corpus, id_col, text_col, k).withColumnRenamed("doc", "doc_id")
    e_sh = _shingle_pairs(eval_docs, eval_id_col, eval_text_col, k).withColumnRenamed(
        "doc", "eval_id"
    )
    return c_sh, e_sh


def _sized_cross_shingles(
    corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
):
    """(c_sh, e_sh) with the per-doc shingle-set size CARRIED on every
    exploded row as a window count (``sz_c`` / ``sz_e``) — the r13
    single-pass form, A/B-verified against the two-subtree sizes
    aggregation at 1x AND the 10x replication tier (r14,
    scripts/ab_jaccard_forms.py: W 1.79/7.21 s vs T 2.03/9.30 s;
    values bit-equal)."""
    from pyspark.sql import Window

    c_sh, e_sh = _cross_shingles(
        corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
    )
    return (
        c_sh.withColumn(
            "sz_c", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        ),
        e_sh.withColumn(
            "sz_e", F.count(F.lit(1)).over(Window.partitionBy("eval_id"))
        ),
    )


def _cross_shingles_pinned(
    corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
):
    """r13 (guide §2.4): both contamination engines consume the corpus
    shingle table TWICE (candidate/common join + per-doc sizes), and
    the shingle build itself is a corpus explode + a per-doc window —
    without a lineage cut every consumer re-ran it. Lazy
    localCheckpoints pin both sides after first materialization;
    callers that already hold shingle tables pass them via the
    ``shingles=`` kwarg instead (the hygiene suite shares ONE build
    between the exact and the LSH engine). r14: the pinned tables
    carry the per-doc sizes (``_sized_cross_shingles``) so NEITHER
    engine pays its own sizes aggregation + join-back over the pin —
    formerly each of the two engines re-aggregated the full corpus
    shingle table for |A| and re-joined it onto its pair table."""
    c_sh, e_sh = _sized_cross_shingles(
        corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
    )
    return (
        c_sh.localCheckpoint(eager=False),
        e_sh.localCheckpoint(eager=False),
    )


def _sized_pair_jaccard(common: DataFrame, threshold: float) -> DataFrame:
    """Threshold + grid-snap over a pair table that already carries
    ``common``/``sz_c``/``sz_e`` (first() over the carried window
    counts — identical values to the former sizes join-back)."""
    from ..functions.numeric import grid

    return (
        common.withColumn(
            "jaccard",
            grid(F.col("common") / (F.col("sz_c") + F.col("sz_e") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_id", "eval_id", "jaccard")
    )


def jaccard_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    shingles: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """EXACT fuzzy decontamination: (doc_id, eval_id, jaccard) for
    corpus×eval pairs whose k-shingle Jaccard >= threshold, computed
    with a full shingle inverted-index join — deterministic, so it can
    carry an exact value oracle (the driver-visible fdecon_* metrics
    use this path).

    Still the asymmetric decontamination shape: the eval shingle side
    is benchmark-sized and broadcasts; the corpus is scanned once and
    only shingle-sharing (doc, eval) pairs reach the count. Candidate
    volume is bounded by shingle co-occurrence with the tiny eval set
    — for corpora with pathological boilerplate overlap, switch to
    :func:`minhash_contamination`, which bounds candidates by banded
    buckets at a tunable recall.

    ``shingles`` (r13): optional pre-built ``(c_sh, e_sh)`` shingle
    tables so a caller running BOTH engines shares one shingle build;
    values are identical. r14: the contract is the SIZED shape
    (``(doc_id, shingle, sz_c)`` / ``(eval_id, shingle, sz_e)``, the
    :func:`_sized_cross_shingles` output) — the per-doc sizes ride
    the rows once instead of each engine re-aggregating them.

    Shape (r13, guide §2.3/§2.4): per-doc shingle-set sizes ride the
    exploded rows as ONE window count over the same evaluated
    subtree, so the corpus shingle table is computed once and
    consumed once — no second sizes aggregation, no lineage pin, and
    the per-pair |A∪B| comes from first() over the carried columns
    (every matched row of a (doc, eval) pair carries the same sz).
    Measured vs the two-subtree (r12) and pinned shapes: 1.31 s vs
    1.49 / 1.60 s steady at sf0.1, re-verified r14 at the 10x tier
    (scripts/ab_jaccard_forms.py: 7.21 vs 9.30 s); at 100 TB this is
    the single-scan shape with one extra exchange of the shingle
    table instead of a second full corpus explode or a corpus-sized
    checkpoint materialization."""
    if shingles is not None:
        c2, e2 = shingles
    else:
        c2, e2 = _sized_cross_shingles(
            corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
        )
    common = (
        c2.join(F.broadcast(e2), "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("sz_c").alias("sz_c"),
            F.first("sz_e").alias("sz_e"),
        )
    )
    return _sized_pair_jaccard(common, threshold)


def minhash_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    shingles: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """FUZZY decontamination, LSH-bounded: like
    :func:`jaccard_contamination` but candidates come from banded
    MinHash buckets (operators/dedup.py::banded_signatures — ONE
    shared banding definition), so per-bucket work stays bounded even
    when corpus and eval share heavy boilerplate shingles. Recall is
    probabilistic (≈1-(1-t^rows)^bands; bands=16/rows=2 gives ~0.99
    at t=0.5); precision 1.0 (exact-Jaccard verify on candidates).

    The exact long-n-gram test (:func:`ngram_contamination`) misses
    paraphrased or lightly edited leaks — a single word change breaks
    every 13-gram crossing it — while shingle-set Jaccard degrades
    gracefully with edit density. Both the eval banded-signature table
    and the eval shingle table broadcast; the corpus is never shuffled
    on document identity before the candidate count. Recall/equality
    contracts: tests/test_decontaminate.py."""
    # r13 (guide §2.4): ONE shingle build serves the MinHash
    # signatures, the candidate-verify join and the per-doc sizes —
    # formerly the corpus was exploded and windowed three times (once
    # inside minhash_signatures, twice via _cross_shingles).
    c_sh, e_sh = shingles or _cross_shingles_pinned(
        corpus, eval_docs, k, id_col, text_col, eval_id_col, eval_text_col
    )
    cand = _minhash_candidates(c_sh, e_sh, num_hashes, bands)
    # r14: |A| and |B| ride the shared sized shingle tables into the
    # verify join — no per-engine sizes aggregation + join-back
    common = (
        cand.join(c_sh, "doc_id")
        .join(
            F.broadcast(e_sh.select("eval_id", "shingle", "sz_e")),
            ["eval_id", "shingle"],
        )
        .groupBy("doc_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("sz_c").alias("sz_c"),
            F.first("sz_e").alias("sz_e"),
        )
    )
    return _sized_pair_jaccard(common, threshold)


def _minhash_candidates(
    c_sh: DataFrame, e_sh: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Distinct (doc_id, eval_id) banded-LSH candidate pairs over
    pre-built shingle tables — the candidate half of
    :func:`minhash_contamination`, exposed so a caller that ALREADY
    holds the exact pair set (the hygiene suite runs both engines
    over one shingle build) can intersect candidates with it instead
    of re-running the exact-Jaccard verify join over the corpus
    shingle table: the engine's output is definitionally
    candidates ∩ {pairs with J >= t} (r14, guide §2.4)."""
    from .dedup import _signatures_from_shingles, banded_signatures

    rows = num_hashes // bands
    c_banded = banded_signatures(
        _signatures_from_shingles(
            c_sh.withColumnRenamed("doc_id", "doc"), num_hashes
        ),
        bands, rows, "doc_id",
    )
    e_banded = banded_signatures(
        _signatures_from_shingles(
            e_sh.withColumnRenamed("eval_id", "doc"), num_hashes
        ),
        bands, rows, "eval_id",
    )
    return (
        c_banded.join(F.broadcast(e_banded), ["band", "bucket"])
        .select("doc_id", "eval_id")
        .distinct()
    )


def substring_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    min_span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """SPAN-grain decontamination — the strictest leak test: find
    every maximal verbatim token span of >= ``min_span_tokens``
    shared between a corpus document and an evaluation document,
    regardless of how small a fraction of either document it is.
    ``ngram_contamination`` counts shared fixed-n grams;
    ``jaccard_contamination`` needs set-level overlap; this reports
    the actual copied REGIONS — (doc_id, eval_id, doc_start,
    eval_start, span_tokens) — so a single embedded benchmark
    question inside a long web page is caught and localizable.

    Composition of the r7 substring machinery
    (operators/dedup.py::_positional_grams — anchor windows with two
    independent 64-bit hashes) with the decontamination family's
    asymmetric shape: the eval anchor table is benchmark-sized and
    BROADCAST, the corpus is scanned once and never shuffled — the
    matches (bounded by true overlap with the tiny eval side) are the
    only rows that reach the per-diagonal run windows. Exact up to
    the 2^-128 anchor collision; DuckDB gram-string-join oracle in
    tests/test_decontaminate.py."""
    from pyspark.sql import Window

    from .dedup import _positional_grams

    c = _positional_grams(corpus, min_span_tokens, id_col, text_col)
    e = _positional_grams(eval_docs, min_span_tokens, eval_id_col, eval_text_col)
    m = (
        c.join(
            F.broadcast(
                e.select(
                    "h1", "h2",
                    F.col("doc").alias("eval_id"),
                    F.col("pos").alias("pos_e"),
                )
            ),
            ["h1", "h2"],
        )
        .select(
            F.col("doc").alias("doc_id"), "eval_id",
            F.col("pos").alias("pos_c"), "pos_e",
        )
    )
    w = Window.partitionBy("doc_id", "eval_id", "diag").orderBy("pos_c")
    runs = m.withColumn("diag", F.col("pos_c") - F.col("pos_e")).withColumn(
        "grp", F.col("pos_c") - F.row_number().over(w)
    )
    return runs.groupBy("doc_id", "eval_id", "diag", "grp").agg(
        F.min("pos_c").alias("doc_start"),
        F.min("pos_e").alias("eval_start"),
        (F.count(F.lit(1)) + (min_span_tokens - 1)).alias("span_tokens"),
    ).select("doc_id", "eval_id", "doc_start", "eval_start", "span_tokens")


def decontaminate_fuzzy(
    corpus: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents whose shingle Jaccard with ANY eval doc
    reaches ``threshold`` (left-anti on the fuzzy-flagged id set) —
    compose with :func:`decontaminate` for the exact-overlap pass."""
    flagged = minhash_contamination(
        corpus, eval_docs, threshold, num_hashes, bands, k,
        id_col, text_col, eval_id_col, eval_text_col,
    ).select("doc_id").distinct()
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
