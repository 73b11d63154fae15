"""Driver-visible corpus-hygiene suite (r4 verdict item #1): one
CORRECTNESS row with a FULL DuckDB oracle covering the round-4
operator families that were pytest-oracled only — PII density
(functions/pii.py), repetition signals (functions/repetition.py),
BM25 relevance (operators/ranking.py), benchmark decontamination
(operators/decontaminate.py) and percentile summaries
(functions/stats.py) — extended in r5 with bigram-LM quality scoring
(operators/ranking.py::bigram_lm_scores) and overlapping
token-window chunking (operators/packing.py::chunk_documents); in r6
with fuzzy decontamination (fdecon_*); and in r7 with cross-document
substring duplication (sdedup_*, operators/dedup.py::
substring_duplicates — the Lee et al. 2022 mode).

Output: ONE wide row of labeled portable aggregates over the
``documents`` table. Integer metrics are exact; bm25_total snaps the
per-document grid-6 scores to the 2-decimal grid before summing
(functions/numeric.py: order-invariant, engine-identical); the
percentiles are Spark's exact ``percentile`` vs DuckDB
``quantile_cont`` (both linear interpolation — bit-identical on the
1e-6 grid, tests/test_stats.py). The oracle SQL replays every metric
from scratch in DuckDB (same patterns, tokenization and math as the
per-operator pytest oracles in tests/test_pii.py, test_repetition.py,
test_ranking.py, test_decontaminate.py, test_stats.py)."""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import pii
from ..functions.text import ENCODING_NOISE_RE, encoding_noise_count
from ..functions.numeric import grid, grid_sql
from ..functions.repetition import _lines, top_ngram_char_fraction
from ..functions.stats import percentile_summary
from ..operators.decontaminate import (
    _cross_shingles_pinned,
    _minhash_candidates,
    _ngram_set,
    jaccard_contamination,
    ngram_contamination,
    substring_contamination,
)
from ..operators.dedup import (
    remove_boilerplate_lines,
    self_duplicate_spans,
    substring_duplicates,
)
from ..operators.packing import chunk_documents
from ..operators.ranking import bigram_lm_scores, bm25_scores
from ..sources.testdata import table

# ---------------------------------------------------------------------------
# Shared persisted corpus (r8, r7 verdict #5): the suite crossJoins
# ~12 independent aggregate families, and before r8 each one re-read
# the documents parquet — ~10 full corpus passes per row. Harmless at
# sf0.1 (0.6 MB) but the wrong 100 TB shape: at scale each pass is a
# full-corpus IO bill. One MEMORY_AND_DISK-persisted frame per
# (session, file, mtime) turns every family subtree into an
# InMemoryTableScan of the same materialization — the same bounded
# train-once/serve-many cache idiom as the IVF codebook caches
# (operators/similarity.py). The cache holds at most ONE frame per
# corpus file (stale mtimes are unpersisted on replacement), so
# long-lived driver/bench sessions reuse rather than accumulate;
# ``uncache_shared_docs()`` releases explicitly.
# ---------------------------------------------------------------------------

_SHARED_DOCS: dict[tuple[int, str], tuple[float, DataFrame]] = {}
# r9 (r8 advisor): the check-then-set below is lock-guarded — two
# threads racing the first call could both persist, leaking one
# MEMORY_AND_DISK frame with no owner to unpersist it.
_SHARED_DOCS_LOCK = threading.Lock()


def _safe_unpersist(df: DataFrame) -> None:
    # the cached session may have been stopped since the entry was
    # made; unpersist against a dead SparkContext raises — evict, not
    # crash (r8 advisor)
    try:
        df.unpersist()
    except Exception:
        pass


def _shared_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark import StorageLevel

    path = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    key = (id(spark), path)
    mtime = os.path.getmtime(path)
    with _SHARED_DOCS_LOCK:
        hit = _SHARED_DOCS.get(key)
        if hit is not None:
            if hit[0] == mtime:
                return hit[1]
            _safe_unpersist(hit[1])
        df = table(spark, sf_dir, "documents").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        _SHARED_DOCS[key] = (mtime, df)
        return df


def uncache_shared_docs() -> None:
    with _SHARED_DOCS_LOCK:
        for _, df in _SHARED_DOCS.values():
            _safe_unpersist(df)
        _SHARED_DOCS.clear()

BM25_TERMS = ["data", "system", "the"]
DECON_N = 8
DECON_EVAL_DOCS = 25
TOP_NGRAM_N = 2
LM_ALPHA = 0.5
CHUNK_TOKENS, CHUNK_OVERLAP = 40, 8
# fuzzy decontamination (r6): eval = every-12th-token-corrupted copies
# of doc_id % 50 == 0 docs — invisible to exact long n-grams, caught
# by shingle Jaccard (tests/test_decontaminate.py proves both halves).
# The VALUE metrics use the exact inverted-index path
# (jaccard_contamination — deterministic, so the oracle can pin them
# bit-exact); the probabilistic MinHash path is driver-checked via a
# recall boolean against that exact set (the dedup_minhash_lsh
# pattern: never pin an exact oracle on banding-recall output).
FDECON_EDIT_EVERY = 12
FDECON_MOD = 50
FDECON_TH = 0.4
FDECON_LSH_RECALL_FLOOR = 0.9
# the LSH engine's banding dial — MUST stay equal to
# minhash_contamination's defaults (the suite's recall count now
# intersects the raw banded candidates with the exact pair set; same
# banding == same candidates == identical count)
FDECON_NUM_HASHES = 32
FDECON_BANDS = 16
# substring dedup (r7, r6 verdict #2): consecutive doc_id pairs share
# an injected 13-token span (6 fixed + group token + 6 fixed — the
# fixed runs are < SDEDUP_MIN_SPAN so only same-group docs can match
# >= the minimum through the injection); natural >= 12-token overlaps
# in the synthetic corpus are caught too, and the oracle replays both.
SDEDUP_MIN_SPAN = 12
# self-duplication (r7): doc_id % 6 == 0 docs get their own first 15
# tokens appended — a verbatim within-doc repetition at a known spot
SSPAN_MOD = 6
# boilerplate-line removal (r7): runs the REAL operator over the
# augmented corpus (whose %5 injection plants the duplicated footer
# line in ~n/5 docs — corpus-hot by construction at >2-doc threshold)
BLINES_MAX_DOCS = 2
# span-grain decontamination (r7): eval docs are the middle 20 tokens
# of every %SCON_MOD corpus doc wrapped in eval-only filler — the
# embedded-verbatim-benchmark regime; the span must localize exactly
SCON_MOD = 40
# Naive-Bayes quality classifier (r7): label-1 docs get a spam-token
# suffix (decisive, linearly separable by construction), the model
# trains on the %NBQ_SPLIT_MOD != 0 docs and scores the held-out
# rest; the oracle replays the full closed-form train+score pipeline
NBQ_SPAM = " win free prize click now offer deal bonus"
NBQ_LABEL_MOD = 3
NBQ_SPLIT_MOD = 4
NBQ_ALPHA = 1.0


def _augmented_text() -> F.Column:
    """The synthetic documents contain no PII and no duplicate lines,
    which would make those metrics vacuously zero (the r3
    dedup_embedding lesson). Deterministically inject both into a
    doc_id-keyed subset — pure column math, replicated verbatim in the
    oracle SQL — so the patterns and line signals are genuinely
    exercised and any regression moves the row."""
    did = F.col("doc_id")
    out = F.col("text")
    out = F.when(
        F.pmod(did, F.lit(7)) == 0,
        F.concat(
            out, F.lit(" contact user"), did.cast("string"),
            F.lit("@example.com from ip 10.0."),
            F.pmod(did, F.lit(256)).cast("string"), F.lit(".1"),
        ),
    ).otherwise(out)
    out = F.when(
        F.pmod(did, F.lit(11)) == 0,
        F.concat(out, F.lit(" call 415-555-0133 or card 4111111111111111")),
    ).otherwise(out)
    out = F.when(
        F.pmod(did, F.lit(5)) == 0,
        F.concat(out, F.lit("\nfooter boilerplate line\nfooter boilerplate line")),
    ).otherwise(out)
    # r5: mojibake markers for the encoding-noise metric (a cp1252
    # right-quote digraph and a double-encoded é)
    out = F.when(
        F.pmod(did, F.lit(13)) == 0,
        F.concat(out, F.lit(" corrupted: cafÃ© itâ€™s")),
    ).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# shared metric builders (r7 refactor): corpus_hygiene_suite (the
# driver contract row) and corpus_hygiene_serving (the benched
# production path) COMPOSE these, so a metric definition can never
# silently diverge between the two — tests/test_corpus.py also pins
# per-column equality of the overlap.
# ---------------------------------------------------------------------------


def _row_agg(aug: DataFrame) -> DataFrame:
    """PII, line-repetition and encoding-noise are all per-row column
    exprs over the SAME augmented text — ONE aggregate pass computes
    the three families (r6: was three separate scans crossJoined;
    the oracle SQL keeps its per-family CTEs, values identical)."""
    counts = pii.pii_counts(F.col("text"))
    total_hits = None
    for c in counts.values():
        total_hits = c if total_hits is None else total_hits + c
    nl = F.size(_lines(F.col("text")))
    nd = F.size(F.array_distinct(_lines(F.col("text"))))
    enc = encoding_noise_count(F.col("text"))
    return aug.agg(
        F.sum(counts["email"]).cast("long").alias("pii_email_hits"),
        F.sum(counts["phone"]).cast("long").alias("pii_phone_hits"),
        F.sum(counts["ipv4"]).cast("long").alias("pii_ipv4_hits"),
        F.sum(counts["card"]).cast("long").alias("pii_card_hits"),
        F.sum((total_hits > 0).cast("long")).alias("pii_docs_flagged"),
        F.sum((nl - nd).cast("long")).alias("rep_dup_lines_total"),
        F.sum(((nl - nd) > 0).cast("long")).alias("rep_dup_line_docs"),
        F.sum(enc).cast("long").alias("enc_noise_hits"),
        F.sum((enc > 0).cast("long")).alias("enc_noise_docs"),
    )


def _bm_agg(docs: DataFrame) -> DataFrame:
    return bm25_scores(docs, BM25_TERMS).agg(
        F.count(F.lit(1)).alias("bm25_matched_docs"),
        F.sum("n_terms_matched").cast("long").alias("bm25_terms_matched"),
        grid(F.coalesce(F.sum(grid(F.col("bm25"), 2)), F.lit(0.0)), 2).alias("bm25_total"),
    )


def _dec_agg(docs: DataFrame, grams=None) -> DataFrame:
    """``grams`` (r13): optional shared (corpus, eval) per-doc n-gram
    frames — the suite builds them ONCE for this family and the bf_*
    family (guide §2.4); values are identical either way."""
    if grams is not None:
        cg, eg = grams
        return cg.join(F.broadcast(eg), "ngram").groupBy(
            "doc_id", "eval_id"
        ).agg(F.count(F.lit(1)).alias("shared_ngrams")).agg(
            F.count(F.lit(1)).alias("decon_pairs"),
            F.sum("shared_ngrams").cast("long").alias("decon_shared_total"),
        )
    eval_docs = docs.orderBy("doc_id").limit(DECON_EVAL_DOCS)
    return ngram_contamination(docs, eval_docs, n=DECON_N).agg(
        F.count(F.lit(1)).alias("decon_pairs"),
        F.sum("shared_ngrams").cast("long").alias("decon_shared_total"),
    )


#: Bloom prefilter parameters for the bf_* contract block: 256 words
#: = 8192 bits at k=4 over ~1-2k eval n-grams — a deliberately LOSSY
#: setting so bf_false_pos is non-degenerate and the no-false-negative
#: guarantee (bf_missed == 0) is tested against real collisions.
BF_WORDS = 256
BF_K = 4


def _bf_agg(docs: DataFrame, grams=None) -> DataFrame:
    """Bloom-filter membership cross-check (operators/membership.py)
    over the SAME eval n-gram set the decon_* block uses: build the
    filter from the eval grams, probe every distinct corpus gram, and
    reduce to exact bf_* LONGs — bitmap population, probe hits, exact
    hits, the false-positive count, and ``bf_missed`` which MUST be 0
    (Bloom's guarantee; a driver-hashed value, not a boolean). This is
    contract surface (suite-only, like the LSH recall check): the
    serving path uses the prefilter inside
    ``bloom_prefiltered_contamination``."""
    from ..operators.membership import (
        bloom_build,
        bloom_literal,
        bloom_probe_literal,
    )

    # the gram frames feed multiple consumers (probe / exact semi-join
    # / anti-join) — cut the lineage once so the corpus gram
    # explode+distinct runs once (the dedup_stage discipline).
    # r13 (guide §2.4): when the suite passes shared per-doc gram
    # frames, the distinct gram sets derive from those instead of
    # re-exploding the corpus a second time for this family.
    if grams is not None:
        cg, eg = grams
    else:
        eval_docs = docs.orderBy("doc_id").limit(DECON_EVAL_DOCS)
        cg = _ngram_set(docs, DECON_N, "doc_id", "text", "doc_id")
        eg = _ngram_set(eval_docs, DECON_N, "doc_id", "text", "eval_id")
    e = (
        eg.select("ngram")
        .distinct()
        .localCheckpoint(eager=False)
    )
    c = cg.select("ngram").distinct()
    # LITERAL probe: collect the parameter-bounded bitmap (BF_WORDS
    # LONGs — a sanctioned bounded driver read, the k-means
    # literal-centroid discipline) and probe as a pure projection —
    # no probe explode, no string re-shuffle, no broadcast join
    words = bloom_literal(
        bloom_build(e, "ngram", n_words=BF_WORDS, k=BF_K), BF_WORDS
    )
    # r14 (guide §2.4): probe-hit, true-hit and missed counts fused
    # into ONE pass over the distinct corpus grams — the bf_member
    # projection plus a broadcast membership flag from the (tiny,
    # benchmark-sized) eval gram set replace the former three separate
    # scalar funnels (probe agg, semi-join agg, anti-join agg), their
    # checkpointed hits table and two of the three 1-row crossJoins.
    # Values are identical by definition: bf_probe_hits counts
    # bf_member=1 grams, bf_true_ngrams counts grams present in the
    # eval set, bf_missed counts true grams the filter failed to flag
    # (Bloom guarantees 0; counted, not assumed).
    flagged = bloom_probe_literal(c, "ngram", words, k=BF_K).join(
        F.broadcast(e.select("ngram", F.lit(1).alias("__true"))),
        "ngram",
        "left",
    )
    counts = flagged.agg(
        F.coalesce(F.sum(F.col("bf_member")), F.lit(0))
        .cast("long")
        .alias("bf_probe_hits"),
        F.coalesce(F.sum(F.coalesce(F.col("__true"), F.lit(0))), F.lit(0))
        .cast("long")
        .alias("bf_true_ngrams"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("__true") == 1) & (F.col("bf_member") == 0), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("bf_missed"),
    )
    # filter-shape facts come straight off the collected bitmap — the
    # same values the bloom frame aggregate produced
    spark = docs.sparkSession
    filt = spark.createDataFrame(
        [
            (
                sum(1 for w in words if w),
                sum(bin(w & 0xFFFFFFFF).count("1") for w in words),
            )
        ],
        "bf_words_nonzero long, bf_bits_set long",
    )
    return (
        filt.crossJoin(F.broadcast(counts))
        .select(
            "bf_words_nonzero",
            "bf_bits_set",
            "bf_probe_hits",
            "bf_true_ngrams",
            (F.col("bf_probe_hits") - F.col("bf_true_ngrams"))
            .cast("long")
            .alias("bf_false_pos"),
            "bf_missed",
        )
    )


def _lm_agg(docs: DataFrame) -> DataFrame:
    # grid-2 snap-then-sum pattern, same as bm25_total
    return bigram_lm_scores(docs, alpha=LM_ALPHA).agg(
        F.count(F.lit(1)).alias("lm_scored_docs"),
        F.sum("n_bigrams").cast("long").alias("lm_bigrams_total"),
        grid(F.coalesce(F.sum(grid(F.col("avg_logp"), 2)), F.lit(0.0)), 2).alias("lm_logp_total"),
    )


def _ch_agg(docs: DataFrame) -> DataFrame:
    return chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap_tokens=CHUNK_OVERLAP
    ).agg(
        F.count(F.lit(1)).alias("chunk_count"),
        F.sum("n_tokens").cast("long").alias("chunk_tokens_total"),
        F.countDistinct(
            F.when(F.col("chunk_index") >= 1, F.col("doc_id"))
        ).alias("chunk_split_docs"),
    )


def _fdecon_eval(docs: DataFrame) -> DataFrame:
    """The injected edited-leak eval set (r6; same construction as
    tests/test_decontaminate.py). Empty tokens are dropped before the
    positional edit: F.trim strips only ASCII spaces, so a doc
    starting with \\t/\\n would yield a leading '' token here while
    the oracle's list_filter removes it — shifting every
    FDECON_EDIT_EVERY-th edit position by one (r6 ADVICE)."""
    etoks = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")), " "
        ),
        lambda t: F.length(t) > 0,
    )
    edited = F.array_join(
        F.transform(
            etoks,
            lambda t, i: F.when(
                (i + 1) % FDECON_EDIT_EVERY == 0, F.lit("xq7")
            ).otherwise(t),
        ),
        " ",
    )
    return docs.where(F.col("doc_id") % FDECON_MOD == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), edited.alias("text")
    )


def _fd_values_from_pairs(pairs: DataFrame) -> DataFrame:
    """fdecon_* VALUE metrics over an exact pair table."""
    return pairs.agg(
        F.count(F.lit(1)).alias("fdecon_pairs"),
        F.countDistinct("doc_id").alias("fdecon_flagged_docs"),
        grid(
            F.coalesce(F.sum(grid(F.col("jaccard"), 2)), F.lit(0.0)), 2
        ).alias("fdecon_jaccard_total"),
    )


def _fd_values_agg(docs: DataFrame, ev: DataFrame, shingles=None) -> DataFrame:
    """The exact-path fdecon VALUE metrics (deterministic — the
    oracle pins them bit-exact); the probabilistic LSH recall boolean
    is suite-only and layered on top there. ``shingles`` (r13): the
    suite shares ONE shingle build with the LSH engine."""
    return _fd_values_from_pairs(
        jaccard_contamination(docs, ev, threshold=FDECON_TH, shingles=shingles)
    )


def _sdedup_corpus(docs: DataFrame) -> DataFrame:
    """The group-span injected corpus: consecutive doc_id pairs share
    a 13-token span (see SDEDUP_MIN_SPAN comment)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" sdx aa bb cc dd ee g"),
            F.floor(F.col("doc_id") / 2).cast("long").cast("string"),
            F.lit(" ff gg hh ii jj kk"),
        ).alias("text"),
    )


def _sd_agg(docs: DataFrame) -> DataFrame:
    return substring_duplicates(
        _sdedup_corpus(docs), min_span_tokens=SDEDUP_MIN_SPAN
    ).agg(
        F.countDistinct("doc_a", "doc_b").alias("sdedup_pairs"),
        F.count(F.lit(1)).alias("sdedup_spans"),
        F.coalesce(F.sum("span_tokens"), F.lit(0)).cast("long").alias("sdedup_span_tokens"),
        F.coalesce(F.max("span_tokens"), F.lit(0)).cast("long").alias("sdedup_max_span"),
    )


def _scon_agg(docs: DataFrame) -> DataFrame:
    """Span-grain decontamination metrics: lifted-snippet eval docs
    (middle 20 tokens of every %SCON_MOD doc, filler-wrapped) against
    the corpus — operators/decontaminate.py::substring_contamination."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    ev = docs.where(F.col("doc_id") % SCON_MOD == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(
            F.lit("evalprefix qq ww "),
            F.array_join(F.slice(toks, 11, 20), " "),
            F.lit(" rr tt evalsuffix"),
        ).alias("text"),
    )
    return substring_contamination(
        docs, ev, min_span_tokens=SDEDUP_MIN_SPAN
    ).agg(
        F.countDistinct("doc_id", "eval_id").alias("scon_pairs"),
        F.count(F.lit(1)).alias("scon_spans"),
        F.coalesce(F.sum("span_tokens"), F.lit(0)).cast("long").alias("scon_tokens"),
    )


def _nbq_agg(docs: DataFrame) -> DataFrame:
    """Naive-Bayes quality-classifier metrics (r7): train on 3/4 of
    the spam-injected corpus, score the held-out 1/4. The spam suffix
    makes the classes separable, so held-out accuracy is a sharp
    driver-checked contract (nbq_correct == nbq_test_docs) rather
    than a vacuous count — and the margin total pins the actual
    log-posterior arithmetic, not just the argmax."""
    from ..operators.classify import nb_score, nb_train

    src = docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(NBQ_LABEL_MOD)) == 0).cast("int").alias("label"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(NBQ_LABEL_MOD)) == 0,
            F.concat(F.col("text"), F.lit(NBQ_SPAM)),
        ).otherwise(F.col("text")).alias("text"),
    )
    train = src.where(F.pmod(F.col("doc_id"), F.lit(NBQ_SPLIT_MOD)) != 0)
    test = src.where(F.pmod(F.col("doc_id"), F.lit(NBQ_SPLIT_MOD)) == 0)
    model = nb_train(train, alpha=NBQ_ALPHA)
    # the model frames feed THREE broadcast subtrees (terms join, meta
    # crossJoin, vocab column) — slot caches run the training scan
    # once, not once per subtree. r13: was bare .cache(), which leaked
    # one model pair per suite execution into the CacheManager (no
    # caller ever unpersisted); the slot evicts the previous
    # execution's frames (functions/cacheslot.py).
    from ..functions.cacheslot import slot_cache

    model = type(model)(
        terms=slot_cache("hygiene.nbq.terms", model.terms),
        meta=slot_cache("hygiene.nbq.meta", model.meta),
    )
    scored = nb_score(model, test).join(test.select("doc_id", "label"), "doc_id")
    agg = scored.agg(
        F.count(F.lit(1)).alias("nbq_test_docs"),
        F.coalesce(F.sum("predicted"), F.lit(0)).cast("long").alias("nbq_pred_pos"),
        F.coalesce(
            F.sum((F.col("predicted") == F.col("label")).cast("long")), F.lit(0)
        ).cast("long").alias("nbq_correct"),
        grid(
            F.coalesce(F.sum(grid(F.col("margin"), 2)), F.lit(0.0)), 2
        ).alias("nbq_margin_total"),
    )
    return agg.crossJoin(
        F.broadcast(model.meta.select(F.col("vocab").alias("nbq_vocab")))
    )


def corpus_hygiene_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _shared_docs(spark, sf_dir)
    aug = docs.select("doc_id", _augmented_text().alias("text"))

    row_agg = _row_agg(aug)

    top_agg = top_ngram_char_fraction(docs, n=TOP_NGRAM_N).agg(
        F.sum("occurrences").cast("long").alias("rep_top_ngram_occurrences"),
        F.sum(
            F.when(
                F.col("top_ngram").isNotNull(),
                F.col("occurrences") * F.length("top_ngram"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("rep_top_ngram_chars"),
    )

    bm_agg = _bm_agg(docs)
    # r13 (guide §2.4): the decon_* and bf_* families consume the SAME
    # corpus/eval 8-gram sets — build them once (lazy localCheckpoint)
    # and pass into both, instead of two corpus gram explodes
    eval_docs = docs.orderBy("doc_id").limit(DECON_EVAL_DOCS)
    cg = _ngram_set(docs, DECON_N, "doc_id", "text", "doc_id").localCheckpoint(
        eager=False
    )
    eg = _ngram_set(
        eval_docs, DECON_N, "doc_id", "text", "eval_id"
    ).localCheckpoint(eager=False)
    dec_agg = _dec_agg(docs, grams=(cg, eg))

    pct = percentile_summary(docs, "n_chars", probs=(0.5, 0.95)).select(
        F.col("p50").alias("len_p50"), F.col("p95").alias("len_p95")
    )

    lm_agg = _lm_agg(docs)
    ch_agg = _ch_agg(docs)

    # exact fdecon values + the suite-only LSH recall boolean.
    # r13 (guide §2.4): ONE shingle build (lazy localCheckpoints)
    # serves the exact engine, the LSH engine's signatures, the
    # candidate verify and the per-doc sizes — formerly the corpus was
    # shingle-exploded + windowed five times across the two engines.
    # r14: the LSH engine's exact-Jaccard verify join is REDUNDANT
    # here — its output is definitionally candidates ∩ exact pairs,
    # and the exact pair table is already computed for the fdecon_*
    # values in this same row. The recall count is now a semi-join of
    # the banded candidates against the (pinned, eval-bounded) exact
    # pair table: one less full pass over the corpus shingle table,
    # identical count by construction.
    ev = _fdecon_eval(docs)
    fd_sh = _cross_shingles_pinned(
        docs, ev, 3, "doc_id", "text", "doc_id", "text"
    )
    fd_pairs = jaccard_contamination(
        docs, ev, threshold=FDECON_TH, shingles=fd_sh
    ).localCheckpoint(eager=False)
    lsh_n = (
        _minhash_candidates(fd_sh[0], fd_sh[1], FDECON_NUM_HASHES, FDECON_BANDS)
        # the exact pair table is eval-bounded (the asymmetric-decon
        # contract: the eval side broadcasts everywhere in this
        # family) — a broadcast semi-join skips sorting/exchanging
        # the candidate side
        .join(F.broadcast(fd_pairs), ["doc_id", "eval_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("__lsh_n"))
    )
    fd_agg = _fd_values_from_pairs(fd_pairs).crossJoin(lsh_n).select(
        "fdecon_pairs", "fdecon_flagged_docs", "fdecon_jaccard_total",
        (
            F.col("__lsh_n")
            >= F.lit(FDECON_LSH_RECALL_FLOOR) * F.col("fdecon_pairs")
        ).alias("fdecon_lsh_recall_ok"),
    )

    sd_agg = _sd_agg(docs)

    # r7: within-doc self-duplication spans over a %SSPAN_MOD
    # self-copy injection, and the boilerplate-line REMOVAL operator
    # run end-to-end over the augmented corpus (the %5 footer
    # injection makes its hot-line set non-vacuous) — chars-removed
    # and docs-changed fold the reassembled output, so reassembly
    # order and blank-line preservation are driver-checked too
    ss = docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(SSPAN_MOD)) == 0,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.array_join(
                    F.slice(
                        F.filter(
                            F.split(F.trim(F.col("text")), r"\s+"),
                            lambda t: F.length(t) > 0,
                        ),
                        1, 15,
                    ),
                    " ",
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    # cap=None so the oracle (no cap clause) is exact by construction;
    # the synthetic docs (~54 tokens) can never reach the default cap
    # anyway (max within-doc occurrences <= len-11)
    ss_agg = self_duplicate_spans(
        ss, min_span_tokens=SDEDUP_MIN_SPAN, max_gram_occurrences=None
    ).agg(
        F.countDistinct("doc_id").alias("sspan_docs"),
        F.count(F.lit(1)).alias("sspan_spans"),
        F.coalesce(F.sum("span_tokens"), F.lit(0)).cast("long").alias("sspan_tokens"),
    )
    bl_out = remove_boilerplate_lines(aug, max_line_docs=BLINES_MAX_DOCS).select(
        "doc_id", F.col("text").alias("__cleaned")
    )
    bl_agg = (
        aug.join(bl_out, "doc_id")
        .agg(
            F.sum((F.col("text") != F.col("__cleaned")).cast("long")).alias(
                "blines_docs_changed"
            ),
            F.sum(F.length("text") - F.length("__cleaned")).cast("long").alias(
                "blines_chars_removed"
            ),
        )
    )

    return (
        row_agg.crossJoin(top_agg)
        .crossJoin(bm_agg).crossJoin(dec_agg).crossJoin(pct)
        .crossJoin(lm_agg).crossJoin(ch_agg).crossJoin(fd_agg)
        .crossJoin(sd_agg).crossJoin(ss_agg).crossJoin(bl_agg)
        .crossJoin(_scon_agg(docs)).crossJoin(_nbq_agg(docs))
        .crossJoin(_bf_agg(docs, grams=(cg, eg)))
    )


def corpus_hygiene_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING-path variant of the suite for the bench (r6 verdict
    #4): the driver-facing contract row above deliberately also runs
    its own verification — the full MinHash re-signing of the corpus
    for the LSH recall boolean on top of the exact shingle-Jaccard —
    which is contract cost, not serving cost, and by r6 it dominated
    the headline total. This entry is what a production pipeline
    would actually run per batch: the fused per-row metric scan, BM25
    / bigram-LM / chunking, exact + fuzzy decontamination values, and
    the substring-duplication metrics — no LSH recall cross-check, no
    second decon engine. Not in the driver registry (every metric
    here is already oracle-covered via ``corpus_hygiene_suite``);
    bench.py times it alongside the contract row so round-over-round
    drift in serving cost is separable from verification cost.

    Composed from the SAME builders as the suite (r7 refactor): a
    metric definition cannot diverge between contract and serving —
    tests/test_corpus.py additionally pins per-column equality of the
    overlap."""
    docs = _shared_docs(spark, sf_dir)
    aug = docs.select("doc_id", _augmented_text().alias("text"))
    ev = _fdecon_eval(docs)
    return (
        _row_agg(aug)
        .crossJoin(_bm_agg(docs)).crossJoin(_dec_agg(docs))
        .crossJoin(_lm_agg(docs)).crossJoin(_ch_agg(docs))
        .crossJoin(_fd_values_agg(docs, ev)).crossJoin(_sd_agg(docs))
        .crossJoin(_scon_agg(docs)).crossJoin(_nbq_agg(docs))
    )


def _esc(p: str) -> str:
    return p.replace("'", "''")


def _pii_count(kind: str) -> str:
    subject = "text"
    if kind == "phone":
        subject = "regexp_replace(text, '" + _esc(pii.IPV4_RE) + "', ';', 'g')"
    return "len(regexp_extract_all(" + subject + ", '" + _esc(pii.PII_PATTERNS[kind]) + "'))"


def _hygiene_sql() -> str:
    n, k = TOP_NGRAM_N, DECON_N
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    total = " + ".join(_pii_count(kind) for kind in pii.PII_PATTERNS)
    return f"""
WITH aug AS (
    SELECT doc_id,
           (CASE WHEN (doc_id % 13) = 0
                 THEN t3 || ' corrupted: caf\u00c3\u00a9 it\u00e2\u20ac\u2122s'
                 ELSE t3 END) AS text
    FROM (
    SELECT doc_id,
           (CASE WHEN (doc_id % 5) = 0
                 THEN t2 || chr(10) || 'footer boilerplate line' || chr(10) || 'footer boilerplate line'
                 ELSE t2 END) AS t3
    FROM (
        SELECT doc_id,
               (CASE WHEN (doc_id % 11) = 0
                     THEN t1 || ' call 415-555-0133 or card 4111111111111111'
                     ELSE t1 END) AS t2
        FROM (
            SELECT doc_id,
                   (CASE WHEN (doc_id % 7) = 0
                         THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                              || '@example.com from ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                         ELSE text END) AS t1
            FROM documents
        )
    )
    )
), pii_per_doc AS (
    SELECT {_pii_count('email')} AS e, {_pii_count('phone')} AS p,
           {_pii_count('ipv4')} AS i, {_pii_count('card')} AS c,
           ({total}) AS tot
    FROM aug
), pii_agg AS (
    SELECT SUM(e) AS pii_email_hits, SUM(p) AS pii_phone_hits,
           SUM(i) AS pii_ipv4_hits, SUM(c) AS pii_card_hits,
           SUM(CASE WHEN tot > 0 THEN 1 ELSE 0 END) AS pii_docs_flagged
    FROM pii_per_doc
), rep_lines AS (
    SELECT list_filter(string_split(text, chr(10)), l -> length(l) > 0) AS ls
    FROM aug
), rep_agg AS (
    SELECT SUM(len(ls) - len(list_distinct(ls))) AS rep_dup_lines_total,
           SUM(CASE WHEN len(ls) > len(list_distinct(ls)) THEN 1 ELSE 0 END) AS rep_dup_line_docs
    FROM rep_lines
), toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> length(t) > 0) AS t
    FROM documents
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {n}
                THEN list_transform(range(1, len(t) - {n} + 2),
                                    i -> array_to_string(t[i:i+{n}-1], ' '))
                ELSE [] END AS gs
    FROM toks
), gram_counted AS (
    SELECT doc_id, ngram, COUNT(*) AS occurrences
    FROM (SELECT doc_id, unnest(gs) AS ngram FROM grams)
    GROUP BY ALL
), gram_top AS (
    SELECT doc_id, ngram, occurrences,
           row_number() OVER (PARTITION BY doc_id ORDER BY occurrences DESC, ngram) AS rn
    FROM gram_counted
), top_agg AS (
    SELECT COALESCE(SUM(occurrences), 0) AS rep_top_ngram_occurrences,
           COALESCE(SUM(occurrences * length(ngram)), 0) AS rep_top_ngram_chars
    FROM gram_top WHERE rn = 1
), dt AS (
    SELECT doc_id, len(t) AS doc_len, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, doc_len, term, COUNT(*) AS tf FROM dt GROUP BY ALL
), corpus AS (
    SELECT COUNT(DISTINCT doc_id) AS n_docs,
           SUM(tf) / COUNT(DISTINCT doc_id) AS avg_len
    FROM tf
), dfs AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf
    WHERE term IN ({terms}) GROUP BY term
), bm25_per_doc AS (
    SELECT tf.doc_id,
           {grid_sql("SUM(ln(1.0 + (c.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.doc_len / c.avg_len)))", 6)} AS bm25,
           COUNT(*) AS n_terms_matched
    FROM tf JOIN dfs USING (term) CROSS JOIN corpus c
    WHERE tf.term IN ({terms})
    GROUP BY tf.doc_id
), bm_agg AS (
    SELECT COUNT(*) AS bm25_matched_docs,
           SUM(n_terms_matched) AS bm25_terms_matched,
           {grid_sql("COALESCE(SUM(" + grid_sql("bm25", 2) + "), 0)", 2)} AS bm25_total
    FROM bm25_per_doc
), dec_grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {k}
                THEN list_distinct(list_transform(range(1, len(t) - {k} + 2),
                                                  i -> array_to_string(t[i:i+{k}-1], ' ')))
                ELSE [] END AS gs
    FROM toks
), corpus_g AS (
    SELECT doc_id, unnest(gs) AS ngram FROM dec_grams
), eval_g AS (
    SELECT doc_id AS eval_id, unnest(gs) AS ngram FROM dec_grams
    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {DECON_EVAL_DOCS})
), dec_pairs AS (
    SELECT c.doc_id, e.eval_id, COUNT(*) AS shared_ngrams
    FROM corpus_g c JOIN eval_g e USING (ngram)
    GROUP BY 1, 2
), dec_agg AS (
    SELECT COUNT(*) AS decon_pairs, COALESCE(SUM(shared_ngrams), 0) AS decon_shared_total
    FROM dec_pairs
), pct AS (
    SELECT {grid_sql("quantile_cont(n_chars, 0.5)", 6)} AS len_p50,
           {grid_sql("quantile_cont(n_chars, 0.95)", 6)} AS len_p95
    FROM documents
), lm_bi AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2)
), lm_bc AS (
    SELECT w1, w2, COUNT(*) AS c12 FROM lm_bi GROUP BY ALL
), lm_cc AS (
    SELECT w1, COUNT(*) AS c1 FROM lm_bi GROUP BY ALL
), lm_v AS (
    SELECT COUNT(DISTINCT term) AS vsize FROM dt
), lm_per_doc AS (
    SELECT doc_id, COUNT(*) AS n_bigrams,
           {grid_sql(f"AVG(ln((c12 + {LM_ALPHA}) / (c1 + {LM_ALPHA} * vsize)))", 6)} AS avg_logp
    FROM lm_bi JOIN lm_bc USING (w1, w2) JOIN lm_cc USING (w1) CROSS JOIN lm_v
    GROUP BY doc_id
), lm_agg AS (
    SELECT COUNT(*) AS lm_scored_docs, SUM(n_bigrams) AS lm_bigrams_total,
           {grid_sql("COALESCE(SUM(" + grid_sql("avg_logp", 2) + "), 0)", 2)} AS lm_logp_total
    FROM lm_per_doc
), chunk_sized AS (
    SELECT doc_id, t,
           CASE WHEN len(t) <= {CHUNK_TOKENS} THEN 1
                ELSE CAST(ceil((len(t) - {CHUNK_TOKENS}) / {CHUNK_TOKENS - CHUNK_OVERLAP}.0) AS INT) + 1
           END AS n_chunks
    FROM toks WHERE len(t) > 0
), chunk_rows AS (
    SELECT doc_id, ci,
           len(list_slice(t, ci * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1,
                          ci * {CHUNK_TOKENS - CHUNK_OVERLAP} + {CHUNK_TOKENS})) AS n_tokens
    FROM (SELECT doc_id, t, unnest(range(0, n_chunks)) AS ci FROM chunk_sized)
), chunk_agg AS (
    SELECT COUNT(*) AS chunk_count, SUM(n_tokens) AS chunk_tokens_total,
           COUNT(DISTINCT CASE WHEN ci >= 1 THEN doc_id END) AS chunk_split_docs
    FROM chunk_rows
), enc_per_doc AS (
    SELECT len(regexp_extract_all(text, '{_esc(ENCODING_NOISE_RE)}')) AS e FROM aug
), enc_agg AS (
    SELECT SUM(e) AS enc_noise_hits,
           SUM(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS enc_noise_docs
    FROM enc_per_doc
), fd_ctoked AS (
    -- list_filter: DuckDB split of an empty string yields [''], which
    -- would fabricate a shingle for blank docs that the Spark side
    -- (tokens() -> [] for blanks) never emits
    SELECT doc_id,
           list_filter(string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM documents
), fd_etoked AS (
    SELECT doc_id + 100000 AS doc_id,
           list_transform(range(1, len(t) + 1),
                          i -> CASE WHEN i % {FDECON_EDIT_EVERY} = 0 THEN 'xq7' ELSE t[i] END) AS t
    FROM fd_ctoked WHERE doc_id % {FDECON_MOD} = 0
), fd_csh AS (
    SELECT doc_id AS doc, unnest(sh) AS shingle FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                    list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                    ELSE [] END AS sh
        FROM fd_ctoked)
), fd_esh AS (
    SELECT doc_id AS eval_id, unnest(sh) AS shingle FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3 THEN
                    list_distinct(list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                    ELSE [] END AS sh
        FROM fd_etoked)
), fd_csz AS (SELECT doc, COUNT(*) AS sz_c FROM fd_csh GROUP BY doc),
   fd_esz AS (SELECT eval_id, COUNT(*) AS sz_e FROM fd_esh GROUP BY eval_id),
   fd_common AS (
    SELECT c.doc AS doc_id, e.eval_id, COUNT(*) AS common
    FROM fd_csh c JOIN fd_esh e USING (shingle) GROUP BY 1, 2
), fd_pairs AS (
    SELECT doc_id, eval_id,
           floor((common / CAST(sz_c + sz_e - common AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS jaccard
    FROM fd_common JOIN fd_csz ON doc = doc_id JOIN fd_esz USING (eval_id)
    WHERE common / CAST(sz_c + sz_e - common AS DOUBLE) >= {FDECON_TH}
), fd_agg AS (
    SELECT COUNT(*) AS fdecon_pairs,
           COUNT(DISTINCT doc_id) AS fdecon_flagged_docs,
           {grid_sql("COALESCE(SUM(" + grid_sql("jaccard", 2) + "), 0)", 2)} AS fdecon_jaccard_total,
           true AS fdecon_lsh_recall_ok
    FROM fd_pairs
), sd_toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(
               text || ' sdx aa bb cc dd ee g' || CAST(doc_id // 2 AS VARCHAR)
                    || ' ff gg hh ii jj kk')), '\\s+'),
               x -> length(x) > 0) AS t
    FROM documents
), sd_gr AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{SDEDUP_MIN_SPAN - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SDEDUP_MIN_SPAN} + 2)) AS i
          FROM sd_toks WHERE len(t) >= {SDEDUP_MIN_SPAN})
), sd_m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
    FROM sd_gr a JOIN sd_gr b USING (g)
    WHERE a.doc_id < b.doc_id
), sd_runs AS (
    SELECT doc_a, doc_b, pos_a - pos_b AS diag,
           pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                      ORDER BY pos_a) AS grp,
           pos_a
    FROM sd_m
), sd_spans AS (
    SELECT doc_a, doc_b, COUNT(*) + {SDEDUP_MIN_SPAN - 1} AS span_tokens
    FROM sd_runs GROUP BY doc_a, doc_b, diag, grp
), sd_agg AS (
    SELECT COUNT(DISTINCT (doc_a, doc_b)) AS sdedup_pairs,
           COUNT(*) AS sdedup_spans,
           COALESCE(SUM(span_tokens), 0) AS sdedup_span_tokens,
           COALESCE(MAX(span_tokens), 0) AS sdedup_max_span
    FROM sd_spans
), ss_src AS (
    SELECT doc_id,
           CASE WHEN doc_id % {SSPAN_MOD} = 0
                THEN text || ' ' || array_to_string(
                         list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> length(x) > 0)[1:15], ' ')
                ELSE text END AS text
    FROM documents
), ss_toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM ss_src
), ss_gr AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{SDEDUP_MIN_SPAN - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SDEDUP_MIN_SPAN} + 2)) AS i
          FROM ss_toks WHERE len(t) >= {SDEDUP_MIN_SPAN})
), ss_m AS (
    SELECT a.doc_id AS doc_id, a.pos AS pos_a, b.pos AS pos_b
    FROM ss_gr a JOIN ss_gr b ON a.doc_id = b.doc_id AND a.g = b.g AND a.pos < b.pos
), ss_runs AS (
    SELECT doc_id, pos_a - pos_b AS diag,
           pos_a - row_number() OVER (PARTITION BY doc_id, pos_a - pos_b
                                      ORDER BY pos_a) AS grp
    FROM ss_m
), ss_spans AS (
    SELECT doc_id, COUNT(*) + {SDEDUP_MIN_SPAN - 1} AS span_tokens
    FROM ss_runs GROUP BY doc_id, diag, grp
), ss_agg AS (
    SELECT COUNT(DISTINCT doc_id) AS sspan_docs,
           COUNT(*) AS sspan_spans,
           COALESCE(SUM(span_tokens), 0) AS sspan_tokens
    FROM ss_spans
), bl_ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS l, text FROM aug
), bl_lines AS (
    SELECT doc_id, i AS pos, l[i] AS line
    FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM bl_ls)
), bl_hot AS (
    SELECT line FROM bl_lines WHERE length(line) > 0
    GROUP BY line HAVING COUNT(DISTINCT doc_id) > {BLINES_MAX_DOCS}
), bl_kept AS (
    SELECT doc_id, pos, line FROM bl_lines
    WHERE line NOT IN (SELECT line FROM bl_hot)
), bl_rebuilt AS (
    SELECT doc_id, array_to_string(list(line ORDER BY pos), chr(10)) AS cleaned
    FROM bl_kept GROUP BY doc_id
), bl_agg AS (
    SELECT SUM(CASE WHEN a.text != COALESCE(r.cleaned, '') THEN 1 ELSE 0 END)
               AS blines_docs_changed,
           SUM(length(a.text) - length(COALESCE(r.cleaned, '')))
               AS blines_chars_removed
    FROM aug a LEFT JOIN bl_rebuilt r USING (doc_id)
), sc_ct AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM documents
), sc_ev AS (
    SELECT doc_id + 900000 AS doc_id,
           list_filter(string_split_regex(lower(
               'evalprefix qq ww ' || array_to_string(t[11:30], ' ')
               || ' rr tt evalsuffix'), '\\s+'),
               x -> length(x) > 0) AS t
    FROM sc_ct WHERE doc_id % {SCON_MOD} = 0
), sc_cg AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{SDEDUP_MIN_SPAN - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SDEDUP_MIN_SPAN} + 2)) AS i
          FROM sc_ct WHERE len(t) >= {SDEDUP_MIN_SPAN})
), sc_eg AS (
    SELECT doc_id AS eval_id, i AS pos, array_to_string(t[i:i+{SDEDUP_MIN_SPAN - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {SDEDUP_MIN_SPAN} + 2)) AS i
          FROM sc_ev WHERE len(t) >= {SDEDUP_MIN_SPAN})
), sc_m AS (
    SELECT c.doc_id, e.eval_id, c.pos AS pos_c, e.pos AS pos_e
    FROM sc_cg c JOIN sc_eg e USING (g)
), sc_runs AS (
    SELECT doc_id, eval_id, pos_c - pos_e AS diag,
           pos_c - row_number() OVER (PARTITION BY doc_id, eval_id, pos_c - pos_e
                                      ORDER BY pos_c) AS grp
    FROM sc_m
), sc_spans AS (
    SELECT doc_id, eval_id, COUNT(*) + {SDEDUP_MIN_SPAN - 1} AS span_tokens
    FROM sc_runs GROUP BY doc_id, eval_id, diag, grp
), sc_agg AS (
    SELECT COUNT(DISTINCT (doc_id, eval_id)) AS scon_pairs,
           COUNT(*) AS scon_spans,
           COALESCE(SUM(span_tokens), 0) AS scon_tokens
    FROM sc_spans
), nb_src AS (
    SELECT doc_id,
           CASE WHEN doc_id % {NBQ_LABEL_MOD} = 0 THEN 1 ELSE 0 END AS label,
           CASE WHEN doc_id % {NBQ_LABEL_MOD} = 0 THEN text || '{_esc(NBQ_SPAM)}'
                ELSE text END AS text
    FROM documents
), nb_toked AS (
    SELECT doc_id, label,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM nb_src
), nb_tr AS (SELECT * FROM nb_toked WHERE doc_id % {NBQ_SPLIT_MOD} != 0),
   nb_te AS (SELECT * FROM nb_toked WHERE doc_id % {NBQ_SPLIT_MOD} = 0),
   nb_occ AS (SELECT label, unnest(t) AS term FROM nb_tr),
   nb_cnt AS (
    SELECT term,
           SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0,
           SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1
    FROM nb_occ GROUP BY term
), nb_tot AS (
    SELECT COALESCE(SUM(c0), 0) AS tot0, COALESCE(SUM(c1), 0) AS tot1,
           COUNT(*) AS v
    FROM nb_cnt
), nb_nd AS (
    SELECT SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nd0,
           SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS nd1,
           COUNT(*) AS n
    FROM nb_tr
), nb_meta AS (
    SELECT {grid_sql("ln(CAST(nd0 AS DOUBLE)) - ln(CAST(n AS DOUBLE))", 6)} AS prior0,
           {grid_sql("ln(CAST(nd1 AS DOUBLE)) - ln(CAST(n AS DOUBLE))", 6)} AS prior1,
           {grid_sql(f"ln({NBQ_ALPHA}) - ln(tot0 + {NBQ_ALPHA} * v)", 6)} AS fb0,
           {grid_sql(f"ln({NBQ_ALPHA}) - ln(tot1 + {NBQ_ALPHA} * v)", 6)} AS fb1
    FROM nb_tot, nb_nd
), nb_ll AS (
    SELECT term,
           {grid_sql(f"ln(c0 + {NBQ_ALPHA}) - ln(tot0 + {NBQ_ALPHA} * v)", 6)} AS ll0,
           {grid_sql(f"ln(c1 + {NBQ_ALPHA}) - ln(tot1 + {NBQ_ALPHA} * v)", 6)} AS ll1
    FROM nb_cnt, nb_tot
), nb_teocc AS (SELECT doc_id, unnest(t) AS term FROM nb_te),
   nb_sums AS (
    SELECT o.doc_id,
           SUM(COALESCE(ll0, fb0)) AS s0, SUM(COALESCE(ll1, fb1)) AS s1
    FROM nb_teocc o LEFT JOIN nb_ll USING (term) CROSS JOIN nb_meta
    GROUP BY o.doc_id
), nb_scored AS (
    SELECT t.doc_id, t.label,
           {grid_sql("(COALESCE(s1, 0) + prior1) - (COALESCE(s0, 0) + prior0)", 2)} AS margin,
           CASE WHEN {grid_sql("(COALESCE(s1, 0) + prior1) - (COALESCE(s0, 0) + prior0)", 2)} > 0
                THEN 1 ELSE 0 END AS predicted
    FROM nb_te t LEFT JOIN nb_sums USING (doc_id) CROSS JOIN nb_meta
), nbq_agg AS (
    SELECT COUNT(*) AS nbq_test_docs,
           COALESCE(SUM(predicted), 0) AS nbq_pred_pos,
           COALESCE(SUM(CASE WHEN predicted = label THEN 1 ELSE 0 END), 0) AS nbq_correct,
           {grid_sql("COALESCE(SUM(" + grid_sql("margin", 2) + "), 0)", 2)} AS nbq_margin_total
    FROM nb_scored
), nbq_v AS (SELECT v AS nbq_vocab FROM nb_tot
), bf_ek AS (
    SELECT DISTINCT ngram FROM eval_g
), bf_ck AS (
    SELECT DISTINCT ngram FROM corpus_g
), bf_j AS (
    SELECT unnest(generate_series(0, {BF_K - 1})) AS j
), bf_bits AS (
    SELECT idx // 32 AS word,
           bit_or(1::BIGINT << CAST(idx % 32 AS INT)) AS bits
    FROM (SELECT (CAST('0x' || substring(md5('bf' || CAST(j AS VARCHAR) || '|' || ngram), 1, 12) AS BIGINT)) % {BF_WORDS * 32} AS idx
          FROM bf_ek, bf_j)
    GROUP BY 1
), bf_hits AS (
    SELECT ngram FROM (
        SELECT p.ngram,
               MIN(COALESCE((b.bits >> CAST(p.idx % 32 AS INT)) & 1, 0)) AS hit
        FROM (SELECT ngram,
                     (CAST('0x' || substring(md5('bf' || CAST(j AS VARCHAR) || '|' || ngram), 1, 12) AS BIGINT)) % {BF_WORDS * 32} AS idx
              FROM bf_ck, bf_j) p
        LEFT JOIN bf_bits b ON (p.idx // 32) = b.word
        GROUP BY p.ngram
    ) WHERE hit = 1
), bf_true AS (
    SELECT ngram FROM bf_ck WHERE ngram IN (SELECT ngram FROM bf_ek)
), bf AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_bits) AS bf_words_nonzero,
           (SELECT CAST(COALESCE(SUM(bit_count(bits)), 0) AS BIGINT) FROM bf_bits) AS bf_bits_set,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_hits) AS bf_probe_hits,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_true) AS bf_true_ngrams,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_hits)
               - (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_true) AS bf_false_pos,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bf_true
            WHERE ngram NOT IN (SELECT ngram FROM bf_hits)) AS bf_missed
)
SELECT CAST(pii_email_hits AS BIGINT) AS pii_email_hits,
       CAST(pii_phone_hits AS BIGINT) AS pii_phone_hits,
       CAST(pii_ipv4_hits AS BIGINT) AS pii_ipv4_hits,
       CAST(pii_card_hits AS BIGINT) AS pii_card_hits,
       CAST(pii_docs_flagged AS BIGINT) AS pii_docs_flagged,
       CAST(rep_dup_lines_total AS BIGINT) AS rep_dup_lines_total,
       CAST(rep_dup_line_docs AS BIGINT) AS rep_dup_line_docs,
       CAST(rep_top_ngram_occurrences AS BIGINT) AS rep_top_ngram_occurrences,
       CAST(rep_top_ngram_chars AS BIGINT) AS rep_top_ngram_chars,
       CAST(bm25_matched_docs AS BIGINT) AS bm25_matched_docs,
       CAST(bm25_terms_matched AS BIGINT) AS bm25_terms_matched,
       bm25_total,
       CAST(decon_pairs AS BIGINT) AS decon_pairs,
       CAST(decon_shared_total AS BIGINT) AS decon_shared_total,
       len_p50, len_p95,
       CAST(lm_scored_docs AS BIGINT) AS lm_scored_docs,
       CAST(lm_bigrams_total AS BIGINT) AS lm_bigrams_total,
       lm_logp_total,
       CAST(chunk_count AS BIGINT) AS chunk_count,
       CAST(chunk_tokens_total AS BIGINT) AS chunk_tokens_total,
       CAST(chunk_split_docs AS BIGINT) AS chunk_split_docs,
       CAST(enc_noise_hits AS BIGINT) AS enc_noise_hits,
       CAST(enc_noise_docs AS BIGINT) AS enc_noise_docs,
       CAST(fdecon_pairs AS BIGINT) AS fdecon_pairs,
       CAST(fdecon_flagged_docs AS BIGINT) AS fdecon_flagged_docs,
       fdecon_jaccard_total,
       fdecon_lsh_recall_ok,
       CAST(sdedup_pairs AS BIGINT) AS sdedup_pairs,
       CAST(sdedup_spans AS BIGINT) AS sdedup_spans,
       CAST(sdedup_span_tokens AS BIGINT) AS sdedup_span_tokens,
       CAST(sdedup_max_span AS BIGINT) AS sdedup_max_span,
       CAST(sspan_docs AS BIGINT) AS sspan_docs,
       CAST(sspan_spans AS BIGINT) AS sspan_spans,
       CAST(sspan_tokens AS BIGINT) AS sspan_tokens,
       CAST(blines_docs_changed AS BIGINT) AS blines_docs_changed,
       CAST(blines_chars_removed AS BIGINT) AS blines_chars_removed,
       CAST(scon_pairs AS BIGINT) AS scon_pairs,
       CAST(scon_spans AS BIGINT) AS scon_spans,
       CAST(scon_tokens AS BIGINT) AS scon_tokens,
       CAST(nbq_test_docs AS BIGINT) AS nbq_test_docs,
       CAST(nbq_pred_pos AS BIGINT) AS nbq_pred_pos,
       CAST(nbq_correct AS BIGINT) AS nbq_correct,
       nbq_margin_total,
       CAST(nbq_vocab AS BIGINT) AS nbq_vocab,
       bf_words_nonzero, bf_bits_set, bf_probe_hits,
       bf_true_ngrams, bf_false_pos, bf_missed
FROM pii_agg, rep_agg, top_agg, bm_agg, dec_agg, pct, lm_agg, chunk_agg, enc_agg, fd_agg, sd_agg, ss_agg, bl_agg, sc_agg, nbq_agg, nbq_v, bf
"""


CORPUS_HYGIENE_SUITE_SQL = _hygiene_sql()

QUERIES = {"corpus_hygiene_suite": corpus_hygiene_suite}
ORACLES = {"corpus_hygiene_suite": CORPUS_HYGIENE_SUITE_SQL}
