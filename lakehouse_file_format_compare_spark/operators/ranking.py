"""Lexical relevance ranking over the documents table: TF-IDF and
BM25 (Robertson/Spärck Jones; the Okapi BM25 formula as published).

The retrieval side of the corpus toolbox — near-dup finds what to
DROP, BM25 finds what to KEEP for a topic (targeted subcorpus
construction, eval-set mining, decontamination sweeps against a
benchmark's queries).

Plan shape (both functions): tokenize → explode → per-(doc, term) TF
→ join a term-stats dimension (document frequency) → per-doc score
sum. Two shuffles (term stats, score-sum by doc) plus one join keyed
by term. The term-stats side is VOCABULARY-sized, orders of magnitude
smaller than the corpus, so at 100 TB it broadcasts (hinted
explicitly) and the whole query stays a single corpus scan + one
doc-keyed aggregation. No UDFs anywhere — log/ln math is codegen'd.

Exact DuckDB oracle in tests/test_ranking.py (same tokenization, same
double math, 1e-6 grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import grid

TOKEN_SPLIT_RE = r"\s+"


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf, doc_len): one row per document x distinct
    term, with term frequency and document token length."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select("doc_id", F.size("toks").alias("doc_len"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen)),
    idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).

    Documents matching no term are omitted (a WHERE on the exploded
    side — at scale this prunes the score-sum shuffle to matching
    docs only). Term stats (df) and corpus stats (N, avg len) are
    tiny aggregates broadcast into the scoring join.
    """
    terms = [t.lower() for t in query_terms]
    dt = _doc_terms(docs, id_col, text_col)
    # r14 (guide §2.4): before, THREE consumers each re-ran the full
    # corpus explode + (doc, term) aggregation — corpus stats, df
    # stats and the matched scoring side. Now:
    # - N and avg_len need no explode at all: docs with >=1 token and
    #   total token count come from one size(tokens) pass (identical
    #   LONGs, identical double division);
    # - the matched (doc, term, tf) table — already pruned to the
    #   query terms, vocabulary-bounded — is slot-cached so the one
    #   remaining explode feeds both the df aggregation and the
    #   scoring join.
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    sizes = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("__n")
    ).where(F.col("__n") > 0)
    corpus_stats = sizes.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        (F.sum("__n") / F.countDistinct("doc_id")).alias("avg_len"),
    )
    from ..functions.cacheslot import slot_cache

    dtm = slot_cache(
        "ranking.bm25_scores.matched_tf",
        dt.where(F.col("term").isin(*terms)),
    )
    df_stats = dtm.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    matched = (
        dtm
        .join(F.broadcast(df_stats), "term")
        .crossJoin(F.broadcast(corpus_stats))
    )
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("doc_len") / F.col("avg_len")))
    )
    return (
        matched.withColumn("term_score", idf * tf_norm)
        .groupBy("doc_id")
        .agg(
            grid(F.sum("term_score"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )


def hybrid_rrf(
    lexical: DataFrame,
    semantic: DataFrame,
    rrf_k: int = 60,
    top_n: int = 10,
    candidates: int = 50,
    id_col: str = "doc_id",
    lex_col: str = "bm25",
    sem_col: str = "cosine",
) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke,
    Büttcher 2009, "Reciprocal rank fusion outperforms Condorcet and
    individual rank learning methods" — public): fuse a lexical
    (BM25) and a semantic (embedding-cosine) candidate list into one
    ranking, score(d) = Σ_lists 1/(rrf_k + rank_list(d)). The
    standard production shape for corpus search / eval-set mining —
    neither list alone survives vocabulary mismatch (semantic) or
    entity precision (lexical).

    Exactness: the fused score is kept as a nano-fixed-point LONG,
    floor(1e9 / (rrf_k + rank)) summed per doc — integer on both
    engines, so the driver hash cannot drift on float division.
    Ranks are deterministic: each list is ordered by (score desc,
    id asc); callers snap scores to the numeric grid first so the
    order itself is cross-engine stable.

    Scale shape: each list is cut to ``candidates`` rows via a
    TakeOrderedAndProject (orderBy + limit — no global sort, no full-
    corpus window); ranking then happens on those constant-size
    frames (a window over ≤``candidates`` rows, the bounded-window
    envelope streaming_plans already documents), and the fusion is a
    full-outer join of two ≤``candidates``-row frames. At 100 TB the
    only corpus-sized work is the scoring the caller already did.

    Returns top ``top_n`` rows: (id_col, rrf_nano, lex_rank,
    sem_rank) — absent-from-a-list ranks are 0.
    """
    from pyspark.sql import Window

    def _ranked(scored: DataFrame, score_col: str, rank_name: str) -> DataFrame:
        top = scored.orderBy(
            F.desc_nulls_last(score_col), F.col(id_col)
        ).limit(candidates)
        w = Window.orderBy(F.desc_nulls_last(score_col), F.col(id_col))
        return top.select(
            F.col(id_col),
            F.row_number().over(w).cast("long").alias(rank_name),
        )

    lex = _ranked(lexical, lex_col, "lex_rank")
    sem = _ranked(semantic, sem_col, "sem_rank")
    contrib = lambda r: F.when(  # noqa: E731
        F.col(r).isNotNull(), F.floor(F.lit(10**9) / (F.lit(rrf_k) + F.col(r)))
    ).otherwise(F.lit(0)).cast("long")
    fused = (
        lex.join(sem, id_col, "full_outer")
        .select(
            F.col(id_col),
            (contrib("lex_rank") + contrib("sem_rank")).alias("rrf_nano"),
            F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).cast("long").alias("sem_rank"),
        )
    )
    return fused.orderBy(F.desc("rrf_nano"), F.col(id_col)).limit(top_n)


def tfidf_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Plain TF-IDF (ln-idf, raw tf) per document for the query bag —
    the simpler cousin kept for parity with classic pipelines."""
    terms = [t.lower() for t in query_terms]
    dt = _doc_terms(docs, id_col, text_col)
    n_docs = dt.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    df_stats = (
        dt.where(F.col("term").isin(*terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        dt.where(F.col("term").isin(*terms))
        .join(F.broadcast(df_stats), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("term_score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("doc_id")
        .agg(grid(F.sum("term_score"), 6).alias("tfidf"))
    )


def bigram_lm_scores(
    docs: DataFrame,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained add-α bigram language-model quality scoring —
    the classic KenLM-style fluency signal for training-data curation
    (docs whose word transitions are improbable under the corpus's
    own statistics are boilerplate/garbled/outlier candidates),
    computed entirely with built-in expressions.

    Model: P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V), trained on the
    scored corpus itself; c(w1·) counts w1 as a bigram CONTEXT (so the
    model is self-consistent: Σ_w P(w|w1) = 1 over the α-smoothed
    vocabulary V = |distinct tokens|). Output per doc with ≥2 tokens:
    ``n_bigrams``, ``avg_logp`` (mean natural-log probability) and
    ``ppl`` = exp(−avg_logp).

    Plan shape / 100 TB: the bigram-count table is corpus-statistics
    sized (can exceed vocab² sparsity bounds) so its join is a
    SHUFFLE hash join keyed by (w1, w2) — explicitly NOT broadcast;
    the context-count table is vocabulary-sized and broadcasts, the
    vocab size is a 1-row broadcast cross. Two corpus-side shuffles
    total (bigram join, doc-keyed average); training and scoring
    share one tokenization.

    Exact DuckDB oracle in tests/test_ranking.py (same tokenization,
    same double math, 1e-6 grid). For the CROSS-DOMAIN variant —
    train on a trusted reference slice, score out-of-distribution
    docs with a BOS context and unseen-context floor, fixed-point
    driver-grade scalars — see operators/lm.py (r10)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    bi = (
        base.where(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.struct(
                        F.element_at("toks", i + 1).alias("w1"),
                        F.element_at("toks", i + 2).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # r14 (guide §2.4): the bigram explode is the heavy pass — it was
    # run THREE times per execution (bigram counts, context counts,
    # scoring join). Now it runs once into a bounded slot cache, and
    # the context counts derive from the (far smaller) bigram-count
    # table instead of the corpus: c(w1·) = Σ_w2 c(w1,w2) — the same
    # LONG by definition.
    from ..functions.cacheslot import slot_cache

    bi = slot_cache("ranking.bigram_lm_scores.bi", bi)
    bigram_counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx_counts = bigram_counts.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1")
    )
    vocab = base.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("vsize")
    )
    scored = (
        bi.join(bigram_counts.hint("shuffle_hash"), ["w1", "w2"])
        .join(F.broadcast(ctx_counts), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log((F.col("c12") + alpha) / (F.col("c1") + alpha * F.col("vsize"))),
        )
    )
    avg_lp = F.sum("logp") / F.count(F.lit(1))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        grid(avg_lp, 6).alias("avg_logp"),
        grid(F.exp(-avg_lp), 6).alias("ppl"),
    )


def oov_rate_scores(
    docs: DataFrame,
    vocab_size: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate against the corpus's own top-K
    vocabulary — the coverage quality gate (docs dominated by tokens
    outside the frequent vocabulary are code dumps, foreign-language
    leaks, or mojibake candidates).

    The vocabulary is the ``vocab_size`` most frequent tokens, ties
    broken lexicographically so the cut is deterministic. Output per
    doc with ≥1 token: ``n_tokens``, ``oov_tokens``, ``oov_rate``
    (fraction of token INSTANCES outside the vocabulary, grid-6).

    Plan shape / 100 TB: token counts aggregate corpus-wide once;
    the top-K cut is a TakeOrderedAndProject (per-partition partial
    top-K, never a global sort shuffle) and the resulting
    vocabulary-sized set broadcasts into the scoring join — one
    corpus scan for stats, one for scoring, no UDFs."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda t: F.length(t) > 0,
    )
    flat = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    vocab = (
        flat.groupBy("term").agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    return (
        flat.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("oov_tokens"),
            grid(
                F.sum(
                    F.when(F.col("__in_vocab").isNull(), F.lit(1.0)).otherwise(F.lit(0.0))
                ) / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )
