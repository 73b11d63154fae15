"""Deduplication operator family for training-data pipelines.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup — each returning DataFrames, each designed
so the expensive pairing step is bounded:

- exact: one shuffle on the fingerprint; canonical = min(doc_id).
- n-gram Jaccard: shingle-explode + shingle-join. Quadratic in bucket
  size — the documented small-scale baseline and the verifier for LSH.
- MinHash+LSH: signature via xxhash64 min-hashing (seeded, JVM-side),
  banded bucketing → candidate pairs only within equal band-hash
  buckets, then exact-Jaccard verification of candidates. This is the
  100 TB path: cost ∝ Σ bucket², controlled by (num_hashes, bands).
- SimHash: 64-bit signature via per-bit weighted majority, hamming
  candidate join on rotated prefix blocks.
- embedding near-dup: cosine ≥ τ pairs, brute-force or LSH-bucketed.

The reference has no dedup beyond ``dropDuplicates`` on PKs (SURVEY
§2.5 A10/A11); this module is the north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V
from ..functions.numeric import grid


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Map every doc to its canonical duplicate-group representative
    (min id among docs sharing a normalized-text fingerprint) plus the
    group size. One hash shuffle on the fingerprint.

    r13 (guide §2.4): group min/size as unordered-frame WINDOW
    aggregates over the fingerprint partition instead of groupBy +
    self-join — the join form scanned (and fingerprinted) the corpus
    TWICE and its map-back relied on broadcasting the per-fingerprint
    group table, which is corpus-sized (one row per distinct text) and
    cannot broadcast at 100 TB, degrading to a sort-merge join with a
    second full exchange. The window form is one scan, one exchange,
    one group pass at any scale; values are identical."""
    w = Window.partitionBy("fp")
    return docs.select(
        F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp")
    ).select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("group_size"),
        "fp",
    )


def _shingle_pairs(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingle table.

    Built as posexplode(tokens) + window LEAD instead of a
    higher-order-function transform: HOF lambdas re-evaluate their
    argument subtree per element (no CSE, and CollapseProject undoes
    any pre-projection), which measured ~60x slower on the shingle
    explode. The lead-window form stays in whole-stage codegen.
    Semantics identical to functions/text.py::word_shingles (distinct
    k-shingles; docs shorter than k tokens contribute their full text
    as a single shingle)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(T.tokens(T.normalized(F.col(text_col)))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    shingled = (
        toks.withColumn("__last", leads[-1])
        .withColumn("shingle", F.concat_ws(" ", *leads))
        .where(F.col("__last").isNotNull())
        .select("doc", "shingle")
    )
    # fallback for docs with <k tokens: whole normalized text as one shingle
    short = (
        docs.select(
            F.col(id_col).alias("doc"), T.normalized(F.col(text_col)).alias("shingle")
        )
        .where(T.token_count(F.col(text_col)) < k)
        .where(F.length("shingle") > 0)
    )
    return shingled.unionByName(short).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via shingle inverted index:
    explode shingles → self-join on shingle → per-pair intersection
    count → |A∪B| from per-doc sizes. Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b. Quadratic in per-shingle bucket size — use
    minhash_lsh_pairs at scale.

    r13 (guide §2.3/§2.4): per-doc sizes ride the shingle rows as one
    window count, so the per-pair |A∪B| is first() over carried
    columns — the separate sizes aggregation AND the two post-join
    exchanges of the pair table (on doc_a, then doc_b) are gone. The
    sized table is slot-cached for the self-join (one cached frame
    per site, the previous call's unpersisted — the former bare
    ``.cache()`` leaked one exploded corpus table per invocation into
    the CacheManager; functions/cacheslot.py)."""
    from ..functions.cacheslot import slot_cache

    sh = slot_cache(
        "dedup.ngram_jaccard_pairs.sh",
        _shingle_pairs(docs, id_col, text_col, k).withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc"))
        ),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first(F.col("a.sz")).alias("sz_a"),
            F.first(F.col("b.sz")).alias("sz_b"),
        )
    )
    return (
        common
        .withColumn("jaccard", grid(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All ORDERED pairs with n-gram containment ≥ threshold:
    C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)| — the
    ASYMMETRIC near-dup detector (Broder 1997, "On the resemblance
    and containment of documents"). Jaccard misses a short document
    embedded in a long one (the union dilutes the score); containment
    flags it from the short side — quote farms, wrapper pages,
    fragment reposts. Returns (doc_a, doc_b, containment) where
    doc_a ≠ doc_b and doc_a is the CONTAINED (numerator) side.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (one
    shingle explode, one shingle-keyed self-join, per-pair count +
    broadcast-friendly size join); the only asymmetry is dividing by
    the contained side's size — at scale the identical bucket-size
    caveat applies and the MinHash/LSH pipeline remains the
    candidate generator of record."""
    from ..functions.cacheslot import slot_cache

    # r13: carried window size + slot cache — the ngram_jaccard_pairs
    # restructure (see there): one sizes pass, no post-join exchange
    # of the pair table, no unbounded CacheManager leak
    sh = slot_cache(
        "dedup.ngram_containment_pairs.sh",
        _shingle_pairs(docs, id_col, text_col, k).withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc"))
        ),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") != F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first(F.col("a.sz")).alias("sz_a"),
        )
    )
    return (
        common
        .withColumn("containment", grid(F.col("common") / F.col("sz_a"), 6))
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: for seed i, sig[i] = min over shingles
    of xxhash64(shingle, i). All JVM-side (explode + groupBy min)."""
    return _signatures_from_shingles(
        _shingle_pairs(docs, id_col, text_col, k), num_hashes
    )


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """:func:`minhash_signatures` over a pre-built (doc, shingle)
    table — so callers that already hold the shingle frame (e.g. the
    contamination engines sharing one build) skip the re-explode.
    Identical arithmetic: the signature mins run over the same rows."""
    mins = sh.groupBy("doc").agg(
        *[F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select("doc", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def banded_signatures(
    sig: DataFrame, bands: int, rows: int, out_id: str = "doc"
) -> DataFrame:
    """(out_id, band, bucket): the banded-LSH bucket table for a
    (doc, signature) frame — bucket = xxhash64 over the band's
    ``rows`` signature slots. THE single definition of the banding
    scheme, shared by :func:`minhash_lsh_pairs` and
    operators/decontaminate.py::minhash_contamination so the
    recall≈1-(1-t^rows)^bands dial means the same thing everywhere."""
    return sig.select(
        F.col("doc").alias(out_id),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        *[F.col("signature")[b * rows + r] for r in range(rows)]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(out_id, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup detection: docs sharing any band
    of the signature become candidates; candidates are verified with
    exact shingle Jaccard. Scale path: the only join is on band-hash
    buckets (bounded, tunable), never all-pairs.

    ``max_bucket_size`` is the 100 TB hot-bucket guard: boilerplate
    text (licence headers, templated pages) can put 10^5+ docs in one
    band-bucket, making that bucket's self-join quadratic. Capping
    skips oversized buckets entirely — bounded work, with recall
    degrading only for clusters so dense they collide in EVERY band
    (those are exact-dup-shaped; run exact_duplicates first, as
    ext/corpus.py does). Default None preserves exhaustive behavior."""
    rows = num_hashes // bands
    from ..functions.cacheslot import slot_cache

    # r14 (guide §2.4): ONE slot-cached shingle table — carrying the
    # per-doc set size as a window count — feeds the signature build
    # AND the two verify join sides. Before, only the signature table
    # was cached: verification re-exploded the corpus shingles three
    # more times per execution (both pair-join sides + a separate
    # sizes aggregation) and attached the sizes through two more
    # post-aggregation joins. At 100 TB that was three extra full
    # corpus explodes; now the explode runs once into the bounded
    # slot and |A|/|B| ride the shingle rows (the r13
    # ngram_jaccard_pairs restructure — window count == groupBy count
    # per doc, values identical).
    sh = slot_cache(
        "dedup.minhash_lsh_pairs.sh",
        _shingle_pairs(docs, id_col, text_col, k).withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("doc"))
        ),
    )
    # the signature aggregate stays slot-cached too: the banded table
    # is self-joined (x and y sides), so an uncached sig would run the
    # 32-hash min aggregate twice per execution
    sig = slot_cache(
        "dedup.minhash_lsh_pairs.sig",
        _signatures_from_shingles(sh, num_hashes),
    )
    banded = banded_signatures(sig, bands, rows)
    if max_bucket_size is not None:
        ok_buckets = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(ok_buckets, ["band", "bucket"], "left_semi")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    common = (
        cand.join(
            sh.select(
                F.col("doc").alias("doc_a"), "shingle", F.col("sz").alias("sz_a")
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc").alias("doc_b"), "shingle", F.col("sz").alias("sz_b")
            ),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
        )
    )
    return (
        common
        .withColumn("jaccard", grid(F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _positional_grams(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc, pos, h1, h2): every word n-gram WITH its 1-based token
    position, keyed by two independent 64-bit gram hashes. Tokens are
    staged in their own projection before the higher-order transform
    consumes them (the decontaminate.py::_ngram_set lesson: lambdas
    re-evaluate unstaged subtrees per element). The gram string never
    leaves the transform — only the two hashes are emitted, so the
    shuffle carries 16 bytes per gram instead of ~6·n chars."""
    staged = docs.select(
        F.col(id_col).alias("doc"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # h2 seeds the fold chain with the CONSTANT first: multi-arg
    # xxhash64 folds left-to-right using the accumulated hash as the
    # next seed, so xxhash64(g, lit(77)) would be XXH64(77, seed=h1)
    # — a pure function of h1 with zero added collision resistance.
    # xxhash64(lit(77), g) = XXH64(g, seed=XXH64(77, 42)) is a
    # differently-seeded hash of g, i.e. genuinely independent
    # (caught by r7 self-review; verified xxhash64(NULL,77)==xxhash64(77)).
    return staged.select("doc", F.posexplode(grams).alias("pos0", "g")).select(
        "doc",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64("g").alias("h1"),
        F.xxhash64(F.lit(77), "g").alias("h2"),
    )


def substring_duplicates(
    docs: DataFrame,
    min_span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Cross-document SUBSTRING duplication — the suffix-array dedup
    mode of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", public knowledge), re-shaped for Spark:
    find every maximal verbatim token span of >= ``min_span_tokens``
    shared between two distinct documents. Doc-level Jaccard dilutes a
    long copied passage inside otherwise-distinct documents below any
    sane threshold; this operator catches exactly that case.

    Returns (doc_a, doc_b, a_start, b_start, span_tokens) with
    doc_a < doc_b: the span starts at 1-based token ``a_start`` in
    doc_a / ``b_start`` in doc_b and runs for ``span_tokens`` >= L
    tokens, and is MAXIMAL (extending it one token either way breaks
    the match). One shared passage yields one row per (position-pair
    diagonal), not one row per contained window.

    Scale shape — anchor k-gram buckets + within-bucket extension,
    never a global suffix array (a 100 TB corpus cannot build one):

    1. every L-token window hashes to a 128-bit anchor (two
       independent xxhash64 values; the gram string itself never
       shuffles). A span of S >= L shared tokens produces S-L+1
       consecutive shared anchors.
    2. anchors self-join on the hash pair — work is Σ per-anchor
       doc-count², the same bounded-bucket profile as MinHash-LSH.
       ``max_gram_docs`` is the boilerplate guard: anchors appearing
       in more documents are dropped (deterministically — the filter
       is replicated in oracles), bounding any one bucket while only
       suppressing spans whose every window is corpus-hot.
    3. matches at (pos_a, pos_b) and (pos_a+1, pos_b+1) are the same
       passage: group by the (doc_a, doc_b, pos_a - pos_b) diagonal,
       split runs where consecutive pos_a gaps (the classic
       pos - row_number() run id), aggregate each run to one maximal
       span. Window partitions are per-(pair, diagonal) — no global
       sort anywhere.

    Exactness: pair formation is exact up to a 2^-128 anchor-hash
    collision (the DuckDB oracle in tests/test_substring_dedup.py
    joins the literal gram STRINGS and matches bit-for-bit, so a
    collision on test data would fail the oracle); the run/extension
    step is exact arithmetic."""
    from pyspark.sql import Window

    from ..functions.cacheslot import slot_cache

    # the gram table feeds both join sides (and the optional cap's
    # histogram): the slot cache runs the tokenize+explode+hash
    # subtree once, not 2-3 times — at warehouse scale the persisted
    # anchor table this stands in for. r13: was a bare .cache(),
    # which no caller could ever unpersist (a lazy result can't
    # unpersist itself) — one leaked gram table per call; the slot
    # evicts the previous invocation's frame instead.
    gr = slot_cache(
        "dedup.substring_duplicates.gr",
        _positional_grams(docs, min_span_tokens, id_col, text_col),
    )
    if max_gram_docs is not None:
        ok = (
            gr.groupBy("h1", "h2")
            .agg(F.countDistinct("doc").alias("__nd"))
            .where(F.col("__nd") <= max_gram_docs)
            .select("h1", "h2")
        )
        gr = gr.join(ok, ["h1", "h2"], "left_semi")
    a = gr.select("h1", "h2", F.col("doc").alias("doc_a"), F.col("pos").alias("pos_a"))
    b = gr.select("h1", "h2", F.col("doc").alias("doc_b"), F.col("pos").alias("pos_b"))
    m = (
        a.join(b, ["h1", "h2"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a", "pos_b")
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    runs = m.withColumn("diag", F.col("pos_a") - F.col("pos_b")).withColumn(
        "grp", F.col("pos_a") - F.row_number().over(w)
    )
    return runs.groupBy("doc_a", "doc_b", "diag", "grp").agg(
        F.min("pos_a").alias("a_start"),
        F.min("pos_b").alias("b_start"),
        (F.count(F.lit(1)) + (min_span_tokens - 1)).alias("span_tokens"),
    ).select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")


def self_duplicate_spans(
    docs: DataFrame,
    min_span_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_occurrences: int | None = 64,
) -> DataFrame:
    """WITHIN-document substring duplication — the other half of the
    Lee et al. 2022 dedup target (a document repeating its own
    boilerplate, e.g. a scraped page with the same nav block twice):
    maximal token spans of >= ``min_span_tokens`` occurring at two
    different positions of the SAME document. Returns
    (doc_id, a_start, b_start, span_tokens) with a_start < b_start;
    same anchor-gram + diagonal-run machinery as
    :func:`substring_duplicates`, with the self-join keyed on
    (doc, anchor) and the diagonal never 0.

    ``max_gram_occurrences`` bounds the one quadratic risk unique to
    the self case: a doc degenerating to one repeated token yields
    O(len²) position pairs. Anchors occurring more than the cap times
    WITHIN a doc are dropped (deterministic, oracle-replicable);
    such docs are exactly what the repetition filters
    (functions/repetition.py) quarantine anyway."""
    from pyspark.sql import Window

    from ..functions.cacheslot import slot_cache

    # r13: slot cache (was a bare .cache() — CacheManager leak per
    # call; see substring_duplicates)
    gr = slot_cache(
        "dedup.self_duplicate_spans.gr",
        _positional_grams(docs, min_span_tokens, id_col, text_col),
    )
    if max_gram_occurrences is not None:
        ok = (
            gr.groupBy("doc", "h1", "h2")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_gram_occurrences)
            .select("doc", "h1", "h2")
        )
        gr = gr.join(ok, ["doc", "h1", "h2"], "left_semi")
    a = gr.select("doc", "h1", "h2", F.col("pos").alias("pos_a"))
    b = gr.select("doc", "h1", "h2", F.col("pos").alias("pos_b"))
    m = (
        a.join(b, ["doc", "h1", "h2"])
        .where(F.col("pos_a") < F.col("pos_b"))
        .select("doc", "pos_a", "pos_b")
    )
    w = Window.partitionBy("doc", "diag").orderBy("pos_a")
    runs = m.withColumn("diag", F.col("pos_a") - F.col("pos_b")).withColumn(
        "grp", F.col("pos_a") - F.row_number().over(w)
    )
    return runs.groupBy("doc", "diag", "grp").agg(
        F.min("pos_a").alias("a_start"),
        F.min("pos_b").alias("b_start"),
        (F.count(F.lit(1)) + (min_span_tokens - 1)).alias("span_tokens"),
    ).select(F.col("doc").alias(id_col), "a_start", "b_start", "span_tokens")


def remove_boilerplate_lines(
    docs: DataFrame,
    max_line_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-WIDE boilerplate line removal (the C4/RefinedWeb
    cleaning step the per-doc repetition signals don't cover): any
    exact line occurring in MORE than ``max_line_docs`` distinct
    documents — nav bars, cookie banners, licence footers — is
    dropped from every document. Complements
    functions/repetition.py (which only measures duplication within
    one doc) and :func:`substring_duplicates` (cross-doc spans at
    token grain, pairwise): this is the set-global, line-grain drop.

    Returns (id_col, text_col) for every input doc, lines rejoined
    with \\n in original order; blank lines are preserved (they are
    never 'boilerplate' — and dropping them would reflow paragraphs).

    Plan shape: one line-grain count aggregate (map-side partial over
    exploded lines), the hot-line set — tiny by construction — comes
    back as a broadcast left-anti join, and docs reassemble with one
    doc-grain groupBy whose collected payload is bounded by the doc's
    own line count. No corpus shuffle beyond the reassembly; at 100 TB
    the hot set is the only global state and it is the small side by
    definition (a line in >K docs appears once in the set no matter
    how many billions of copies exist)."""
    lines = docs.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    hot = (
        lines.where(F.length("__line") > 0)
        .groupBy("__line")
        .agg(F.countDistinct("__doc").alias("__nd"))
        .where(F.col("__nd") > max_line_docs)
        .select("__line")
    )
    kept = lines.join(F.broadcast(hot), "__line", "left_anti")
    rebuilt = kept.groupBy("__doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(text_col)
    )
    # docs whose EVERY line was hot drop out of `kept`; restore as ''
    return (
        docs.select(F.col(id_col))
        .join(rebuilt, docs[id_col] == rebuilt["__doc"], "left")
        .select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The repair half of the Lee et al. 2022 workflow: given the
    span table from :func:`substring_duplicates`, excise every
    detected span from the NON-canonical side — per pair the doc with
    the larger id (``doc_b``) loses tokens
    [b_start, b_start + span_tokens) — so one verbatim copy of each
    duplicated passage survives the corpus. Returns (id_col, text_col)
    for EVERY input doc (repaired or untouched).

    Semantics & caveats, stated exactly:

    - positions refer to the whitespace-token stream, which is
      IDENTICAL for the original and the lowercased detection pipeline
      (lowercasing never changes whitespace), so the repair keeps the
      original casing of surviving tokens;
    - the rebuilt text is single-space joined — inter-token
      whitespace is normalized (the detection tokenizer already
      treats all runs of whitespace as one separator);
    - overlapping/adjacent intervals need no pre-merge: a token dies
      if ANY interval covers it;
    - resolution is per-pair, so a doc that is ``doc_b`` in one pair
      and ``doc_a`` in another keeps the span it is canonical for —
      every DETECTED pair is resolved (proven by the
      re-run-finds-no-old-pair test), while exactly one copy remains
      corpus-wide per connected group.

    Plan shape: spans aggregate to one interval-list row per repaired
    doc (bounded by spans-per-doc, tiny), broadcast-joinable back to
    the corpus; the excision is a JVM-side filter over the token
    array. One groupBy at doc grain + one join — no shuffle of the
    corpus beyond the join, no Python. DuckDB value oracle:
    tests/test_substring_dedup.py."""
    iv = spans.groupBy(F.col("doc_b").alias("__doc")).agg(
        F.collect_list(
            F.struct(
                F.col("b_start").cast("long").alias("lo"),
                (F.col("b_start") + F.col("span_tokens")).cast("long").alias("hi"),
            )
        ).alias("__iv")
    )
    toked = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
        ).alias("__toks"),
    )
    joined = toked.join(iv, toked[id_col] == iv["__doc"], "left")
    kept = F.filter(
        F.transform(
            F.col("__toks"),
            lambda t, i: F.struct(t.alias("t"), (i + 1).alias("pos")),
        ),
        lambda s: ~F.exists(
            F.coalesce(F.col("__iv"), F.array().cast("array<struct<lo:long,hi:long>>")),
            lambda r: (s["pos"] >= r["lo"]) & (s["pos"] < r["hi"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(text_col),
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: token-hash bit majority vote, computed
    as explode → per-bit conditional sums (JVM-side; no UDF)."""
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(T.tokens(T.normalized(F.col(text_col)))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc", sig.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit signature quarters (a
    pair within hamming ≤ 3 of 64 bits must agree on ≥1 of 4 blocks),
    verify hamming distance via bit_count(xor)."""
    from ..functions.cacheslot import slot_cache

    # r13: slot cache (was a bare .cache() — CacheManager leak per
    # call; see ngram_jaccard_pairs)
    sig = slot_cache(
        "dedup.simhash_near_pairs.sig",
        simhash_signatures(docs, id_col, text_col),
    )
    blocks = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(q).alias("q"), F.shiftright("simhash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("blk"))
                for q in range(4)
            ])
        ).alias("qb"),
    ).select("doc", "simhash", "qb.q", "qb.blk")
    cand = (
        blocks.alias("x")
        .join(
            blocks.alias("y"),
            (F.col("x.q") == F.col("y.q")) & (F.col("x.blk") == F.col("y.blk")) & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force). O(n²) distance
    evaluations — correct baseline and verifier; use
    ``embedding_near_dup_lsh`` below at scale."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", grid(V.cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path for embedding near-dup: multi-table random-hyperplane
    LSH bucketing -> exact-cosine verification of candidates.

    Verified-candidate design (same contract as minhash_lsh_pairs):
    output is always a SUBSET of the brute-force pair set — every
    candidate is re-scored with exact cosine before emission, so
    precision is 1.0 and only recall is probabilistic:
    recall ≈ 1-(1-(1-θ/π)^bits)^tables, θ = acos(threshold). At the
    operator's designed regime (near-duplicates, cos ≥ 0.95, θ ≤ 18°)
    that is ≥ 0.95 with the defaults; the contract is pinned against
    brute force in tests/test_embedding_neardup.py.

    Cost: signatures are one Arrow matmul per batch
    (similarity._all_signatures_pandas); pairing is a self-join on
    (table, signature) buckets — Σ bucket² work, never C(n,2); the
    candidate set is deduplicated across tables BEFORE vectors are
    re-joined, so each surviving pair is scored once. Hot buckets
    (e.g. zero-vector clusters) are optionally capped like the MinHash
    path: buckets above ``max_bucket_size`` are dropped (bounded work,
    documented recall loss on degenerate clusters).
    """
    from .similarity import _all_signatures_pandas, _hyperplanes

    all_planes: list[list[float]] = []
    for t in range(tables):
        all_planes.extend(_hyperplanes(dim, bits, seed + 7919 * t))
    sig_udf = _all_signatures_pandas(all_planes, bits)

    ids = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    buckets = (
        ids.withColumn("sigs", sig_udf(F.col("vec")))
        .select("vid", F.posexplode("sigs").alias("t", "sig"))
    )
    if max_bucket_size is not None:
        counts = buckets.groupBy("t", "sig").agg(F.count(F.lit(1)).alias("__n"))
        buckets = (
            buckets.join(counts, ["t", "sig"])
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    a = buckets.select("t", "sig", F.col("vid").alias("id_a"))
    b = buckets.select("t", "sig", F.col("vid").alias("id_b"))
    cand = (
        a.join(b, ["t", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = ids.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    vb = ids.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", grid(V.cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_near_dup_pairs(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public): k-means-cluster the embedding space,
    then compare pairs ONLY within a cluster.

    Same verified-candidate contract as the LSH paths: every emitted
    pair carries its exact grid-6 cosine and passed the threshold, so
    precision vs the brute-force pair set is 1.0 by construction and
    only recall is approximate (cross-cluster near-dups are missed —
    by design; true near-identical vectors assign to the same nearest
    centroid, and identical vectors ALWAYS do, deterministically).

    ``centroids`` come from ``similarity.train_ivf_centroids`` (seeded
    Lloyd on a bounded sample) so assignment is one narrow
    Arrow-batched projection, no shuffle. The pairing self-join is
    keyed on the cluster id — Σ cluster², never C(n,2); pass
    ``max_cluster_size`` to drop degenerate clusters (the hot-bucket
    cap of the MinHash/LSH paths) for a hard work bound at 100 TB.

    Pair scoring uses the Arrow-vectorized cosine
    (``similarity._pair_cosine_pandas``: one numpy reduction per
    batch) — the Σ cluster² hot path, where the interpreted JVM HOF
    fold measured ~4x slower at sf0.1. Sum-order ulp drift vs the JVM
    fold is absorbed by the grid-6 snap everywhere the values are
    compared (clone pairs land exactly on 1.0 either way); the
    driver-pinned suite totals snap to grid-2 on top.
    """
    from .similarity import _pair_cosine_pandas, ivf_assign

    assigned = ivf_assign(
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")),
        centroids,
        "vec",
    )
    if max_cluster_size is not None:
        counts = assigned.groupBy("__list").agg(F.count(F.lit(1)).alias("__n"))
        assigned = (
            assigned.join(counts, "__list")
            .where(F.col("__n") <= max_cluster_size)
            .drop("__n")
        )
    a = assigned.select("__list", F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    b = assigned.select("__list", F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, "__list")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", grid(_pair_cosine_pandas()(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end semantic dedup: cluster-bounded near-dup pairs →
    connected components → keep the min-id representative of each
    semantic group (``canonicalize``). Output = ``embeddings`` plus
    (canonical_id, is_canonical); downstream keeps ``is_canonical``.
    Within a component exactly one row survives, so no two kept rows
    are joined by any found pair. Pass ``pairs`` (a cached result of
    :func:`semantic_near_dup_pairs` on the same inputs) to skip
    recomputing the pairing when the caller already materialized it."""
    from .components import canonicalize

    if pairs is None:
        pairs = semantic_near_dup_pairs(
            embeddings, centroids, threshold=threshold,
            id_col=id_col, vec_col=vec_col, max_cluster_size=max_cluster_size,
        )
    return canonicalize(
        embeddings, pairs.select("id_a", "id_b"), id_col=id_col,
        src="id_a", dst="id_b",
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup: a NEW batch against an EXISTING corpus
# signature store — the production shape (daily crawl vs historical
# index). The history is represented ONLY by its MinHash signatures
# (num_hashes longs per doc, ~few hundred bytes — a 10^10-doc corpus
# carries a low-TB store vs re-shingling 100 TB of text every batch);
# history text is never touched. Verification is the signature-
# ESTIMATED Jaccard (matching slots / num_hashes — the standard
# at-scale detector; the estimate's sd is sqrt(j(1-j)/H)), identical
# for the in-batch and cross-history sides so the incremental fold is
# EXACTLY equivalent to one full run over the union (proven in
# tests/test_incremental_dedup.py).
#
# Drop rule (order-free, component-free): a new doc is dropped iff it
# has a verified pair with ANY history doc, or with ANY smaller-id doc
# of its own batch. The store indexes EVERY seen doc (survivors and
# dropped alike — "have I seen something like this", not "is this in
# the canonical corpus"), so under id-ordered batches (history ids
# precede batch ids — the natural crawl shape) this is precisely the
# full-run rule "drop d iff some verified pair (d', d) with d' < d":
# folding batches one at a time commutes with one big run. A
# survivors-only store would NOT commute (a new doc similar only to a
# previously-dropped doc would slip through), which is why dropped
# docs stay indexed.
# ---------------------------------------------------------------------------


def signature_est_jaccard(sig_a, sig_b, num_hashes: int):
    """Estimated Jaccard between two MinHash signatures: fraction of
    agreeing slots. Pure JVM higher-order functions (arrays are
    num_hashes-sized, never data-sized)."""
    eq = F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda a, b: a == b), lambda x: x
        )
    )
    return eq / F.lit(num_hashes)


def signature_store(
    docs: DataFrame,
    num_hashes: int = 32,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, signature) — what a corpus batch persists for future
    incremental dedup. Docs with no tokens have no shingles, hence no
    signature row (they can never near-dup anything)."""
    return minhash_signatures(docs, num_hashes, k, id_col, text_col)


def _est_verified(cand: DataFrame, sigs_a: DataFrame, sigs_b: DataFrame,
                  threshold: float, num_hashes: int) -> DataFrame:
    """cand(doc_a, doc_b) -> pairs whose estimated Jaccard clears the
    threshold. Signature joins are doc-keyed (broadcast-or-shuffle by
    AQE); the array comparison is per-candidate, O(num_hashes)."""
    j = (
        cand.join(
            sigs_a.select(F.col("doc").alias("doc_a"),
                          F.col("signature").alias("__sa")),
            "doc_a",
        )
        .join(
            sigs_b.select(F.col("doc").alias("doc_b"),
                          F.col("signature").alias("__sb")),
            "doc_b",
        )
        .withColumn(
            "est_jaccard",
            signature_est_jaccard(F.col("__sa"), F.col("__sb"), num_hashes),
        )
    )
    return j.where(F.col("est_jaccard") >= threshold).select(
        "doc_a", "doc_b", "est_jaccard"
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    history_sigs: DataFrame | None,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
    new_sigs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup ``new_docs`` against ``history_sigs`` (a signature_store
    frame, or None for the first batch) AND within itself. Returns
    ``(kept_docs, updated_store)`` where updated_store = history plus
    ALL the batch's signatures (see module note: indexing dropped docs
    too is what makes the fold equal one full run) — feed it to the
    next batch.

    Work per batch: shingle + sign the NEW batch only; the history
    side contributes band-bucket joins against its (tiny) signature
    store. ``max_bucket_size`` is the same hot-bucket guard as
    minhash_lsh_pairs, applied to the UNION bucket table so a
    boilerplate bucket is capped consistently on both sides.
    ``new_sigs`` (optional): the batch's precomputed signature_store
    frame — callers that also persist the batch signatures (the
    streaming loader) pass it to avoid signing twice."""
    rows = num_hashes // bands
    if new_sigs is None:
        new_sigs = minhash_signatures(docs=new_docs, num_hashes=num_hashes,
                                      k=k, id_col=id_col, text_col=text_col)
    banded_new = banded_signatures(new_sigs, bands, rows)
    if history_sigs is not None:
        banded_hist = banded_signatures(history_sigs, bands, rows)
        all_banded = banded_new.unionByName(banded_hist)
    else:
        banded_hist = None
        all_banded = banded_new
    if max_bucket_size is not None:
        ok_buckets = (
            all_banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded_new = banded_new.join(ok_buckets, ["band", "bucket"], "left_semi")
        if banded_hist is not None:
            banded_hist = banded_hist.join(
                ok_buckets, ["band", "bucket"], "left_semi"
            )

    dropped_parts = []
    if banded_hist is not None:
        cross_cand = (
            banded_hist.alias("x")
            .join(
                banded_new.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                # a doc never near-dups ITSELF: if the history store
                # already contains a batch doc's id (an at-least-once
                # redelivery, or a crash-replay against a partially
                # committed store), the self-match would drop the doc
                # at Jaccard 1 (r12 advisor, high)
                & (F.col("x.doc") != F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .distinct()
        )
        cross_pairs = _est_verified(
            cross_cand, history_sigs, new_sigs, threshold, num_hashes
        )
        dropped_parts.append(cross_pairs.select(F.col("doc_b").alias("doc")))
    in_cand = (
        banded_new.alias("x")
        .join(
            banded_new.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    in_pairs = _est_verified(in_cand, new_sigs, new_sigs, threshold, num_hashes)
    dropped_parts.append(in_pairs.select(F.col("doc_b").alias("doc")))

    dropped = dropped_parts[0]
    for part in dropped_parts[1:]:
        dropped = dropped.unionByName(part)
    dropped = dropped.distinct()

    kept = new_docs.join(
        dropped.select(F.col("doc").alias(id_col)), id_col, "left_anti"
    )
    store = (
        new_sigs if history_sigs is None
        else history_sigs.unionByName(new_sigs)
    )
    return kept, store


def full_minhash_est_dedup(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """One-shot reference for the incremental fold: keep doc d iff no
    est-verified pair (d', d) with d' < d over the WHOLE corpus. The
    incremental fold over any id-ordered batch split must return
    exactly this kept set (tests/test_incremental_dedup.py)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, k, id_col, text_col)
    banded = banded_signatures(sigs, bands, rows)
    if max_bucket_size is not None:
        ok_buckets = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        banded = banded.join(ok_buckets, ["band", "bucket"], "left_semi")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    pairs = _est_verified(cand, sigs, sigs, threshold, num_hashes)
    return docs.join(
        pairs.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


# ---------------------------------------------------------------------------
# Incremental EMBEDDING dedup (r10, r9 verdict #4): the minhash
# signature-store pattern applied to the semantic path — a NEW batch
# of vectors against the bucket store of everything seen. The store
# holds (vid, vec, buckets): the vector itself (embeddings ARE the
# compact representation — 64 floats ≈ a MinHash signature) plus its
# precomputed LSH/cluster bucket ids, so history is never re-signed
# (no Arrow matmul, no centroid scoring on old rows — just an explode
# of stored longs). Candidates arise ONLY via bucket-equality joins
# (Σ bucket² cross history×new, never |new|×|history|); every
# candidate is re-scored with the exact grid-6 cosine before it can
# drop anything, so precision is 1.0 and only recall is probabilistic
# (identical vectors ALWAYS share every bucket — planted duplicates
# are deterministic drops).
#
# Drop rule (identical to incremental_minhash_dedup): a new vector is
# dropped iff a verified pair links it to ANY history vector or ANY
# smaller-id vector of its own batch; the store indexes every seen
# vector (dropped included), so under id-ordered batches the per-batch
# fold returns EXACTLY the one-shot full-run kept set
# (tests/test_incremental_embedding.py proves 2- and 3-batch folds and
# the dropped-doc-chain counterexample shape). The bucket function is
# a pure per-vector map (fixed seeded hyperplanes / frozen centroids),
# so candidate sets — hence verified pairs, hence drops — are
# batch-split-invariant by construction. ``max_bucket_size`` breaks
# that equivalence (a bucket's population grows as batches fold);
# leave it None when exact fold equality matters, set it for the hard
# work bound at 100 TB (documented recall loss, same trade as
# minhash_lsh_pairs).
# ---------------------------------------------------------------------------


def embedding_signature_store(
    embeddings: DataFrame,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, vec, buckets) — what a vector batch persists for future
    incremental dedup. ``buckets[t] = t * 2^bits + sig_t`` (the table
    offset keeps per-table signature spaces disjoint, one flat LONG
    bucket id). Hyperplanes are the same seeded family as
    embedding_near_dup_lsh, so store and one-shot paths bucket
    identically."""
    from .similarity import _all_signatures_pandas, _hyperplanes

    all_planes: list[list[float]] = []
    for t in range(tables):
        all_planes.extend(_hyperplanes(dim, bits, seed + 7919 * t))
    sig_udf = _all_signatures_pandas(all_planes, bits)
    width = 1 << bits
    return embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).withColumn(
        "buckets",
        F.transform(
            sig_udf(F.col("vec")),
            lambda sig, t: t.cast("long") * F.lit(width) + sig,
        ),
    )


def semantic_store(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, vec, buckets=[cluster]) — the SemDeDup bucket store: one
    bucket per vector, its nearest frozen centroid. Centroids come
    from ``similarity.train_ivf_centroids`` trained ONCE on a bounded
    sample; they must stay frozen across batches for the fold contract
    (retraining mid-stream re-buckets history — a rebuild, not a
    fold)."""
    from .similarity import ivf_assign

    return (
        ivf_assign(
            embeddings.select(
                F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
            ),
            centroids,
            "vec",
        )
        .withColumn("buckets", F.array(F.col("__list").cast("long")))
        .drop("__list")
    )


def _inc_bucket_dedup(
    new_rows: DataFrame,
    history_store: DataFrame | None,
    threshold: float,
    max_bucket_size: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared incremental skeleton over (vid, vec, buckets) stores.
    Returns (dropped_vids, updated_store).

    The signed batch is lazily localCheckpoint'd (the pagerank
    discipline): new_rows feeds FOUR subtrees (both candidate sides,
    the verification vectors, the store union) and without the
    lineage cut each reference re-runs the Arrow signature matmul /
    centroid scoring — measured 6 ArrowEvalPython nodes in the
    un-checkpointed batch-2 plan. With it, the batch is signed exactly
    once when the first action fires, and the returned store hands the
    NEXT batch materialized longs instead of a re-signing plan."""
    new_rows = new_rows.localCheckpoint(eager=False)
    banded_new = new_rows.select("vid", F.explode("buckets").alias("bucket"))
    banded_hist = (
        None
        if history_store is None
        else history_store.select("vid", F.explode("buckets").alias("bucket"))
    )
    if max_bucket_size is not None:
        all_banded = (
            banded_new if banded_hist is None
            else banded_new.unionByName(banded_hist)
        )
        ok_buckets = (
            all_banded.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_bucket_size)
            .select("bucket")
        )
        banded_new = banded_new.join(ok_buckets, "bucket", "left_semi")
        if banded_hist is not None:
            banded_hist = banded_hist.join(ok_buckets, "bucket", "left_semi")

    new_vecs = new_rows.select("vid", "vec")
    cand_parts = []
    if banded_hist is not None:
        cand_parts.append(
            banded_hist.alias("x")
            .join(banded_new.alias("y"), "bucket")
            .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
            .distinct()
        )
    cand_parts.append(
        banded_new.alias("x")
        .join(
            banded_new.alias("y"),
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    hist_vecs = (
        new_vecs if history_store is None
        else history_store.select("vid", "vec").unionByName(new_vecs)
    )
    dropped = None
    for cand in cand_parts:
        verified = (
            cand.join(
                hist_vecs.select(F.col("vid").alias("id_a"),
                                 F.col("vec").alias("__va")),
                "id_a",
            )
            .join(
                new_vecs.select(F.col("vid").alias("id_b"),
                                F.col("vec").alias("__vb")),
                "id_b",
            )
            .withColumn("cosine", grid(V.cosine(F.col("__va"), F.col("__vb")), 6))
            .where(F.col("cosine") >= threshold)
            .select(F.col("id_b").alias("vid"))
        )
        dropped = verified if dropped is None else dropped.unionByName(verified)
    dropped = dropped.distinct()
    store = (
        new_rows if history_store is None
        else history_store.unionByName(new_rows)
    )
    return dropped, store


def incremental_embedding_dedup(
    new_embeddings: DataFrame,
    history_store: DataFrame | None,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    new_rows: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup ``new_embeddings`` against ``history_store`` (an
    embedding_signature_store frame, or None for the first batch) AND
    within itself. Returns (kept_embeddings, updated_store); feed the
    store to the next batch. History vectors are never re-signed —
    only their stored bucket longs are exploded into the join.
    ``new_rows`` (optional): the batch's precomputed
    embedding_signature_store frame — callers that also persist the
    batch rows (the streaming loader) pass it to avoid signing
    twice."""
    if new_rows is None:
        new_rows = embedding_signature_store(
            new_embeddings, bits=bits, tables=tables, dim=dim, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    dropped, store = _inc_bucket_dedup(
        new_rows, history_store, threshold, max_bucket_size
    )
    kept = new_embeddings.join(
        dropped.select(F.col("vid").alias(id_col)), id_col, "left_anti"
    )
    return kept, store


def full_embedding_est_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot reference for the incremental embedding fold: keep v
    iff no verified pair (v', v) with v' < v over the whole corpus
    (same buckets, same exact-cosine verification). Any id-ordered
    batch split folded through incremental_embedding_dedup must return
    exactly this kept set."""
    rows = embedding_signature_store(
        embeddings, bits=bits, tables=tables, dim=dim, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    dropped, _ = _inc_bucket_dedup(rows, None, threshold, max_bucket_size)
    return embeddings.join(
        dropped.select(F.col("vid").alias(id_col)), id_col, "left_anti"
    )


def incremental_semantic_dedup(
    new_embeddings: DataFrame,
    history_store: DataFrame | None,
    centroids: list[list[float]],
    threshold: float = 0.95,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup, incrementally: new batch vs the (vid, vec, cluster)
    store under FROZEN centroids. Same fold-equals-full-run contract
    as the LSH path (cluster assignment is a pure per-vector map)."""
    new_rows = semantic_store(new_embeddings, centroids, id_col, vec_col)
    dropped, store = _inc_bucket_dedup(
        new_rows, history_store, threshold, max_cluster_size
    )
    kept = new_embeddings.join(
        dropped.select(F.col("vid").alias(id_col)), id_col, "left_anti"
    )
    return kept, store


def full_semantic_dedup_ordered(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot ordered-drop reference for the incremental semantic
    fold (keep v iff no verified same-cluster pair (v', v), v' < v —
    the sequential-crawl rule, vs semantic_dedup's component-canonical
    rule which needs the whole graph at once and therefore has no
    incremental form)."""
    rows = semantic_store(embeddings, centroids, id_col, vec_col)
    dropped, _ = _inc_bucket_dedup(rows, None, threshold, max_cluster_size)
    return embeddings.join(
        dropped.select(F.col("vid").alias(id_col)), id_col, "left_anti"
    )


def ppjoin_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold via prefix
    filtering (PPJoin, Xiao-Wang-Lin-Yu 2008 "Efficient Similarity
    Joins for Near Duplicate Detection") — same output as
    :func:`ngram_jaccard_pairs`, asymptotically fewer candidates, NO
    recall loss (unlike the MinHash path).

    Principle: under any global total order on shingles, two sets
    with Jaccard >= t MUST share a shingle within each set's first
    ``|A| - ceil(t*|A|) + 1`` elements (the prefix) — so the inverted
    index only ever indexes prefixes, and the candidate volume is
    quadratic in PREFIX-bucket sizes, not full-bucket sizes. A length
    filter (``t*|A| <= |B|``, applied on the canonical a<b side) cuts
    further. Candidates are then verified with one exact
    set-intersection per pair (array_intersect on the per-doc sorted
    shingle arrays — JVM, no shuffle beyond the candidate join).

    The global order is (corpus frequency asc, xxhash64) — rare-first
    minimizes prefix-bucket sizes (the paper's heuristic). The order
    is a SORT KEY, not a rank: no global row_number window exists;
    per-doc prefixes come from an ``array_sort`` over the doc's own
    (count, hash, shingle) structs, and correctness holds under ANY
    total order, so the frequency join staying vocabulary-bounded is
    purely an optimization.

    Scale shape (100 TB): one shingle explode (shared discipline with
    the other dedup tiers), one vocabulary-bounded count join, the
    prefix-bucket self-join (the only pair-quadratic term, bounded by
    prefix-bucket sizes), and a candidate-keyed verify join carrying
    two shingle arrays per pair. Returns (doc_a, doc_b, jaccard
    grid-6), doc_a < doc_b.

    Regime note (measured, sf0.1 local[8] warm): on the SYNTHETIC
    testdata corpus — tiny shared vocabulary, moderate uniform
    shingle buckets — the naive count-join wins (1.7 s vs 5.6 s):
    PPJoin pays per-doc array sorting + a per-candidate
    array_intersect verify, and the prefix filter removes little
    when buckets never explode. Its candidate bound is the property
    that matters on Zipf-skewed REAL text, where a handful of
    stop-shingles give the naive join quadratic buckets; the
    candidate-volume contract (tests/test_ppjoin.py) pins that bound
    directly, and the r11 crossover contract
    (tests/test_scale_contracts.py::
    test_ppjoin_beats_naive_on_zipf_skewed_corpus) DEMONSTRATES the
    win condition: on a boilerplate-heavy corpus the naive pair
    universe is exactly n(n-1)/2 while the PPJoin prefix candidates
    are exactly the planted duplicate pairs, and the measured walls
    cross (naive ~quadratic growth, PPJoin ~linear; see PROFILE_r11
    for the committed readings).
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    sh = _shingle_pairs(docs, id_col, text_col, k)
    counts = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    # per-doc shingle array sorted by the global (cnt, hash, shingle)
    # order; structs sort lexicographically so array_sort IS the order
    ordered = (
        sh.join(counts, "shingle")
        .groupBy("doc")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__cnt").alias("c"),
                        F.xxhash64("shingle").alias("h"),
                        F.col("shingle").alias("s"),
                    )
                )
            ).alias("__arr")
        )
        .select(
            "doc",
            F.transform(F.col("__arr"), lambda x: x["s"]).alias("shs"),
            F.size("__arr").alias("sz"),
        )
        .localCheckpoint(eager=False)  # 3 consumers: 2 prefix sides + verify
    )
    t = float(threshold)
    prefix_len = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")).cast("int") + 1
    prefixes = ordered.select(
        "doc",
        "sz",
        F.explode(F.slice(F.col("shs"), 1, prefix_len)).alias("shingle"),
    )
    pa = prefixes.alias("pa")
    pb = prefixes.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (F.col("pa.doc") < F.col("pb.doc"))
            # length filter: Jaccard >= t forces t*max <= min <= max
            & (F.least(F.col("pa.sz"), F.col("pb.sz")).cast("double")
               >= F.lit(t) * F.greatest(F.col("pa.sz"), F.col("pb.sz"))),
        )
        .select(
            F.col("pa.doc").alias("doc_a"), F.col("pb.doc").alias("doc_b")
        )
        .distinct()
    )
    aa = ordered.select(
        F.col("doc").alias("doc_a"), F.col("shs").alias("shs_a"),
        F.col("sz").alias("sz_a"),
    )
    bb = ordered.select(
        F.col("doc").alias("doc_b"), F.col("shs").alias("shs_b"),
        F.col("sz").alias("sz_b"),
    )
    from ..functions.numeric import grid

    common = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .withColumn("__common", common)
        .withColumn(
            "jaccard",
            grid(
                F.col("__common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("__common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
