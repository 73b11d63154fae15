"""Tokenizer-training statistics: word vocabulary and BPE merge-pair
counts (the first merge step of byte-pair-encoding training,
Sennrich et al. 2016 — "Neural Machine Translation of Rare Words
with Subword Units").

Scale shape (the real BPE trainer trick): pair statistics are NOT
counted over the corpus — they are counted over the DISTINCT-WORD
table weighted by word frequency. The corpus is touched exactly once
(word explode + count, one shuffle with map-side combine); the
character-pair explode then runs over the vocabulary, which is
orders of magnitude smaller than the corpus and grows
sub-linearly (Heaps' law). A trainer that explodes character pairs
straight off the corpus does |corpus tokens| × word-length work per
iteration; this does |vocab| × word-length.

Everything is built-in-function JVM work (split/explode/transform/
substring) — no Python in the path — and every output is exactly
replayable in DuckDB (string_split_regex/generate_series/substr),
so the operators carry value oracles, not just shape tests.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no text surface at all; extension surface in the text-analysis
category (SURVEY §2 extensions; functions/text.py has the
BPE-ish token COUNT — this is the training-statistics half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT_RE = r"\s+"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
        ).alias("word")
    ).where(F.length("word") > 0)


def word_vocabulary(
    docs: DataFrame, text_col: str = "text", top_v: int = 100
) -> DataFrame:
    """(word, n) for the ``top_v`` most frequent whitespace words,
    deterministic tie-break on the word. One corpus scan, one shuffle
    (map-side combine), TakeOrderedAndProject for the top-V — no
    global sort."""
    if top_v < 1:
        raise ValueError("top_v must be >= 1")
    return (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(top_v)
    )


def bpe_merge_candidates(
    docs: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """(pair, n) for the ``top_k`` most frequent adjacent character
    pairs across the corpus — exactly the statistic BPE training
    greedily merges on (iteration 1 of the algorithm; subsequent
    iterations re-run this over the merged symbol table). Counted
    over the distinct-word table weighted by word frequency, so the
    corpus-sized explode happens ONCE (for the word counts) and the
    quadratic-ish pair explode runs over the vocabulary only."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    wc = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wn"))
        .where(F.length("word") >= 2)
    )
    pairs = wc.select(
        "__wn",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1),"
                   " i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("__wn").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# BPE train + apply (r10, r9 verdict #5): the other half of the
# tokenizer family. ``bpe_merge_candidates`` above is iteration 1 of
# training; ``bpe_train`` runs the full greedy loop and ``bpe_apply``
# tokenizes a corpus with a FIXED trained merge list. Both keep the
# Heaps-law shape: every per-word computation (pair counting, the
# merge folds) runs over the DISTINCT-WORD table weighted by
# frequency; the corpus is touched exactly once per operator (the
# word explode), and the word→tokens map is broadcast back.
#
# Merge semantics (Sennrich 2016, subword-nmt): one merge (x, y)
# rewrites every non-overlapping left-to-right adjacent occurrence of
# x,y into the single symbol x||y; merges apply in list order. The
# Spark implementation is a JVM ``aggregate`` fold over the symbol
# array (greedy by construction: a freshly merged symbol is the new
# "last" and cannot re-merge as x in the same pass); the DuckDB
# replay encodes symbols as '<s>' runs and chains literal
# ``replace('<x><y>' -> '<xy>')`` — string replace is non-overlapping
# left-to-right, so the two formulations are exactly equivalent (the
# encoding is oracle-side only and assumes '<'/'>' do not occur in
# the corpus — asserted by the tests on the testdata).
# ---------------------------------------------------------------------------


def _merge_fold(arr, x: str, y: str):
    """One BPE merge pass over a symbol array, greedy left-to-right,
    as a whole-stage-codegen ``aggregate`` (no Python)."""
    xy = x + y
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(x))
            & (s == F.lit(y)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(xy))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_bpe_tokens(words: DataFrame, merges, word_col: str = "word") -> DataFrame:
    """``words`` plus a ``tokens`` column: the word's BPE
    tokenization under the fixed ``merges`` list (applied in order).
    Meant for DISTINCT-word tables — this is the map that gets
    broadcast back to the corpus."""
    arr = F.split(F.col(word_col), "")
    for x, y in merges:
        arr = _merge_fold(arr, x, y)
    return words.withColumn("tokens", arr)


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Greedy BPE training: ``n_merges`` iterations of (count adjacent
    symbol pairs over the frequency-weighted distinct-word table,
    merge the most frequent pair, repeat). Deterministic: ties break
    on (x, y) ascending. Returns the ordered merge list — plain
    literals, broadcastable, no state to ship.

    Scale shape: the corpus is scanned ONCE (the word-count shuffle);
    each iteration then runs on the vocab-sized symbol table, which is
    eagerly localCheckpoint'd so the plan stays one-merge deep instead
    of growing by a fold per iteration. The per-iteration driver read
    is a single argmax row (bounded-collect discipline). Stops early
    when no pair occurs at least twice."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    symtab = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wn"))
        .withColumn("syms", F.split(F.col("word"), ""))
        # r13: lazy — materializes inside the first argmax job
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            symtab.where(F.size("syms") >= 2)
            .select(
                "__wn",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS x, syms[i] AS y))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("__wn").cast("long").alias("n"))
        )
        best = pairs.orderBy(F.col("n").desc(), "x", "y").limit(1).collect()
        if not best or best[0]["n"] < 2:
            break
        x, y = best[0]["x"], best[0]["y"]
        merges.append((x, y))
        # r13: LAZY checkpoint — the fold materializes inside the next
        # iteration's argmax job instead of as its own eager action,
        # halving the per-merge job count; the final fold (after the
        # last accepted merge) is never consumed and never runs
        symtab = symtab.withColumn(
            "syms", _merge_fold(F.col("syms"), x, y)
        ).localCheckpoint(eager=False)
    return merges


def bpe_apply(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: (id, n_words,
    n_bpe_tokens) per document. The corpus-sized explode feeds ONE
    (id, word) count aggregation; both consumers — the distinct-word
    table the folds run on, and the per-doc rollup — re-aggregate
    that same exchange (ReusedExchange, the divergence-report
    discipline), so the corpus is scanned and shuffled exactly once
    and the word→token-count map rides back on a broadcast."""
    base = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    # the word table re-aggregates base WITH its count column: a bare
    # distinct() lets Catalyst prune the (id, word) aggregate out of
    # this branch, making the two subtrees differ — then AQE cannot
    # reuse the corpus exchange and the corpus is scanned twice. The
    # "+ __wn * 0" keeps the count consumed (it cannot constant-fold:
    # NULL semantics) so both branches stay canonical-identical.
    words = base.groupBy("word").agg(F.sum("__c").alias("__wn"))
    word_map = word_bpe_tokens(words, merges).select(
        "word", (F.size("tokens") + F.col("__wn") * F.lit(0)).alias("__nt")
    )
    return (
        base.join(F.broadcast(word_map), "word")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_words"),
            F.sum(F.col("__c") * F.col("__nt")).cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_token_usage(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """(token, n): corpus-weighted BPE token frequencies under the
    fixed merge list — the trained tokenizer's observed vocabulary
    usage. Token explode runs over the distinct-word table weighted
    by word frequency (the same trick as bpe_merge_candidates)."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    wc = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wn"))
    )
    toks = word_bpe_tokens(wc, merges).select(
        "__wn", F.explode("tokens").alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("__wn").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(top_k)
    )


ZIPF_TOP_R = 50


def zipf_fit(
    docs: DataFrame, text_col: str = "text", top_r: int = ZIPF_TOP_R
) -> DataFrame:
    """Zipf-law fit over the top-``top_r`` vocabulary — the corpus-
    health diagnostic (natural language runs a log-log slope near -1;
    boilerplate-heavy or templated corpora flatten it, mojibake
    steepens it; Zipf 1949, Piantadosi 2014).

    OLS slope of ln(freq) on ln(rank), computed EXACTLY: each
    ln value is snapped to an integer MICRO grid and the normal-
    equation terms are LONG sums of LONG products, so the numerator
    and denominator are bit-equal cross-engine and layout-proof; only
    the final slope divides back to a double.

    Returns ONE row:
    - ``zipf_terms`` — ranked vocabulary terms used (<= top_r);
    - ``zipf_num`` / ``zipf_den`` — exact LONG normal-equation terms
      (slope = num/den = (k*Sxy - Sx*Sy) / (k*Sxx - Sx^2));
    - ``zipf_slope_grid`` — num/den floor-snapped to the 1e-6 grid.

    Overflow budget: ln values < 25 (micro < 2.5e7) even at 100 TB
    frequencies; with top_r <= 1000, k*Sxy < ~6e17 — inside LONG.

    Scale shape: one corpus scan (the word-count shuffle with map-
    side combine), TakeOrderedAndProject for the top-R cut, then a
    window + aggregate over <= top_r rows — vocabulary-bounded
    everywhere past the first shuffle.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("word"))
    ranked = (
        word_vocabulary(docs, text_col, top_v=top_r)
        .withColumn("r", F.row_number().over(w))
        .select(
            F.floor(F.log(F.col("r").cast("double")) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("x"),
            F.floor(F.log(F.col("n").cast("double")) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("y"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.coalesce(
        F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"), F.lit(0)
    )
    den = F.coalesce(
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0)
    )
    return agg.select(
        F.col("k").alias("zipf_terms"),
        num.cast("long").alias("zipf_num"),
        den.cast("long").alias("zipf_den"),
        F.when(
            den != 0,
            F.floor(
                num.cast("double") / den.cast("double") * 1_000_000
                + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("zipf_slope_grid"),
    )


# --- unigram-LM tokenizer (Kudo 2018, "Subword Regularization:
# Improving Neural Network Translation Models with Multiple Subword
# Candidates") — the second industrial tokenizer family next to BPE.
# The apply half is a Viterbi segmentation: given a piece vocabulary
# with per-piece costs, each word is split into the piece sequence of
# minimum total cost. Costs here are INTEGER nanos (a trained model
# ships -ln(p) snapped to a grid), so the whole DP is LONG arithmetic
# — bit-equal cross-engine, no float anywhere in the path.

UV_MAX_PIECE = 4      # candidate/vocab piece length bound
UV_MAX_WORD = 12      # DP unroll bound; longer words score as one OOV
UV_ENC = 1 << 10      # encoded DP state: cost_nanos * 1024 + n_tokens


def unigram_piece_stats(
    docs: DataFrame,
    top_k: int = 50,
    max_piece_len: int = UV_MAX_PIECE,
    text_col: str = "text",
) -> DataFrame:
    """(piece, n): corpus-weighted frequencies of every substring of
    length 1..``max_piece_len`` — the candidate-vocabulary seeding
    statistics of unigram-LM tokenizer training (Kudo 2018 starts
    from a large substring-frequency seed vocabulary and prunes).
    Deterministic top-k by (n desc, piece).

    Scale shape: the substring explode runs over the DISTINCT-word
    table weighted by frequency (the bpe_merge_candidates trick) —
    |vocab| x word-length work, never |corpus| x word-length."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    wc = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wn"))
    )
    n = F.length("word")

    # NB: a 2-parameter lambda would be read by F.transform as
    # (element, index) — bind the piece length via a factory instead
    def _sub(l: int):
        return lambda i: F.substring(F.col("word"), i, l)

    per_len = [
        F.when(
            n >= l,
            F.transform(F.sequence(F.lit(1), n - l + 1), _sub(l)),
        ).otherwise(F.expr("CAST(array() AS array<string>)"))
        for l in range(1, max_piece_len + 1)
    ]
    pieces = wc.select("__wn", F.explode(F.flatten(F.array(*per_len))).alias("piece"))
    return (
        pieces.groupBy("piece")
        .agg(F.sum("__wn").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "piece")
        .limit(top_k)
    )


def _uv_word_state(word, vocab: dict[str, int], oov_char_nanos: int):
    """Encoded Viterbi state for one word column: LONG
    min-cost*1024 + token-count over all segmentations into vocab
    pieces (single characters always available at the OOV cost).
    One whole-stage-codegen ``aggregate`` fold over the character
    positions; the vocabulary rides as a literal map — no broadcast
    exchange, no Python."""
    entries: list = []
    for p, c in sorted(vocab.items()):
        entries.append(F.lit(p))
        entries.append(F.lit(int(c) * UV_ENC + 1).cast("long"))
    m = F.create_map(*entries) if entries else None
    oov_enc = F.lit(int(oov_char_nanos) * UV_ENC + 1).cast("long")

    def _lookup(piece):
        return F.element_at(m, piece) if m is not None else F.lit(None).cast("long")

    def _step(acc, j):
        # acc is 1-indexed: acc[i] = state_{i-1}; state_{j-l} = acc[j-l+1]
        terms = [
            F.element_at(acc, j)
            + F.coalesce(_lookup(F.substring(word, j, 1)), oov_enc)
        ]
        max_l = max((len(p) for p in vocab), default=1)
        for l in range(2, max_l + 1):
            terms.append(
                F.when(
                    j >= l,
                    F.element_at(acc, j - l + 1)
                    + _lookup(F.substring(word, j - l + 1, l)),
                )
            )
        return F.concat(acc, F.array(F.least(*terms) if len(terms) > 1 else terms[0]))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        _step,
    )
    return F.element_at(dp, -1)


def unigram_apply(
    docs: DataFrame,
    vocab: dict[str, int],
    oov_char_nanos: int = 5_000_000_000,
    longword_nanos: int = 50_000_000_000,
    max_word_len: int = UV_MAX_WORD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a fixed unigram-LM model: per document
    (id, n_words, n_uv_tokens, uv_cost_nanos) under minimum-cost
    Viterbi segmentation. ``vocab`` maps piece -> integer nano cost
    (-ln p on the 1e-9 grid in a real model; any non-negative LONG
    here). Single characters not in the vocabulary cost
    ``oov_char_nanos``; words longer than ``max_word_len`` score as
    ONE token at ``longword_nanos`` (keeps the DP depth — and the
    static SQL replay — bounded).

    Determinism: ties between segmentations are resolved inside the
    encoded LONG state (min cost, then min token count) — the
    returned scalars are unique even when the argmin path is not.

    Scale shape: identical to :func:`bpe_apply` — ONE corpus explode
    + (id, word) aggregation, the DP runs on the Heaps-law-small
    distinct-word table, and the word -> (tokens, cost) map rides
    back on a broadcast join."""
    if any(c < 0 for c in vocab.values()) or oov_char_nanos < 0:
        raise ValueError("piece costs must be non-negative")
    if any(len(p) == 0 or len(p) > max_word_len for p in vocab):
        raise ValueError("vocab pieces must be 1..max_word_len chars")
    base = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    words = base.groupBy("word").agg(F.sum("__c").alias("__wn"))
    state = _uv_word_state(F.col("word"), vocab, oov_char_nanos)
    # "+ __wn * 0" keeps the count consumed so the corpus exchange
    # stays reusable (see bpe_apply)
    word_map = words.select(
        "word",
        (
            F.when(F.length("word") > max_word_len, F.lit(1).cast("long"))
            .otherwise(state % UV_ENC)
            + F.col("__wn") * F.lit(0)
        ).alias("__nt"),
        F.when(F.length("word") > max_word_len, F.lit(int(longword_nanos)))
        .otherwise(F.shiftright(state, 10))
        .cast("long")
        .alias("__cost"),
    )
    return (
        base.join(F.broadcast(word_map), "word")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_words"),
            F.sum(F.col("__c") * F.col("__nt")).cast("long").alias("n_uv_tokens"),
            F.sum(F.col("__c") * F.col("__cost")).cast("long").alias(
                "uv_cost_nanos"
            ),
        )
    )


def _wp_word_state(word, vocab: dict[str, int], oov_char_nanos: int):
    """Encoded greedy longest-match-first (WordPiece-style, Wu et al.
    2016) state for one word column: scan left to right, at each
    position consume the LONGEST vocab piece starting there (single
    characters always consumable at the OOV cost). State rides one
    LONG: consumed-position * 2^40 + cost-micros * 1024 + tokens —
    the fold visits every character index but only positions equal to
    the consumed frontier advance it, which is how a while-loop
    becomes a whole-stage-codegen ``aggregate``.

    Cost field is MICROS (cost_nanos // 1000) so the three fields fit
    one LONG: pos <= 12 (4 bits at the top via 2^40 stride), micros
    <= 12 * 50e6 < 2^30, tokens < 1024."""
    max_l = max((len(p) for p in vocab), default=1)
    entries: list = []
    for p, c in sorted(vocab.items()):
        entries.append(F.lit(p))
        entries.append(F.lit((int(c) // 1000) * UV_ENC + 1).cast("long"))
    m = F.create_map(*entries) if entries else None
    oov_enc = F.lit((int(oov_char_nanos) // 1000) * UV_ENC + 1).cast("long")
    POS = F.lit(1 << 40).cast("long")

    def _lookup(piece):
        return F.element_at(m, piece) if m is not None else F.lit(None).cast("long")

    def _step(acc, j):
        pos = F.floor(acc / POS).cast("long")
        # longest match at the frontier: try l = max_l .. 2, then the
        # always-available single char
        consume = F.coalesce(
            *[
                _lookup(F.substring(word, j, l)) + F.lit(l).cast("long") * POS
                for l in range(max_l, 1, -1)
            ],
            F.coalesce(_lookup(F.substring(word, j, 1)), oov_enc) + POS,
        ) if max_l > 1 else (
            F.coalesce(_lookup(F.substring(word, j, 1)), oov_enc) + POS
        )
        return F.when(pos == j, acc + consume).otherwise(acc)

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        POS,  # frontier starts at position 1, zero cost, zero tokens
        _step,
    )
    return dp % POS  # strip the frontier; cost_micros*1024 + tokens


def wordpiece_apply(
    docs: DataFrame,
    vocab: dict[str, int],
    oov_char_nanos: int = 5_000_000_000,
    longword_nanos: int = 50_000_000_000,
    max_word_len: int = UV_MAX_WORD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with greedy longest-match-first (the
    WordPiece inference rule; Wu et al. 2016, "Google's Neural
    Machine Translation System"): per document (id, n_words,
    n_wp_tokens, wp_cost_micros). Same corpus shape as
    :func:`unigram_apply` (one explode, Heaps-small word table,
    broadcast map-back); greedy differs from Viterbi exactly where a
    long piece is a cost trap — the pair of operators exposes that
    difference as data (tests pin a case where greedy takes more
    tokens than optimal).

    A longest-MATCH tie cannot exist (one piece per (position,
    length)), so greedy is deterministic without any encoding trick;
    costs are micros here (see _wp_word_state's field layout)."""
    if any(c < 0 for c in vocab.values()) or oov_char_nanos < 0:
        raise ValueError("piece costs must be non-negative")
    if any(len(p) == 0 or len(p) > max_word_len for p in vocab):
        raise ValueError("vocab pieces must be 1..max_word_len chars")
    base = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    words = base.groupBy("word").agg(F.sum("__c").alias("__wn"))
    state = _wp_word_state(F.col("word"), vocab, oov_char_nanos)
    word_map = words.select(
        "word",
        (
            F.when(F.length("word") > max_word_len, F.lit(1).cast("long"))
            .otherwise(state % UV_ENC)
            + F.col("__wn") * F.lit(0)
        ).alias("__nt"),
        F.when(
            F.length("word") > max_word_len, F.lit(int(longword_nanos) // 1000)
        )
        .otherwise(F.shiftright(state, 10))
        .cast("long")
        .alias("__cost"),
    )
    return (
        base.join(F.broadcast(word_map), "word")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_words"),
            F.sum(F.col("__c") * F.col("__nt")).cast("long").alias("n_wp_tokens"),
            F.sum(F.col("__c") * F.col("__cost")).cast("long").alias(
                "wp_cost_micros"
            ),
        )
    )


def multi_tokenizer_apply(
    docs: DataFrame,
    merges,
    vocab: dict[str, int],
    oov_char_nanos: int = 5_000_000_000,
    longword_nanos: int = 50_000_000_000,
    max_word_len: int = UV_MAX_WORD,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All THREE apply families fused over ONE corpus pass (r13, guide
    §2.3/§2.4): per document ``(id, n_words, n_bpe_tokens,
    n_uv_tokens, uv_cost_nanos, n_wp_tokens, wp_cost_micros)``.

    :func:`bpe_apply`, :func:`unigram_apply` and
    :func:`wordpiece_apply` build the IDENTICAL (id, word) aggregate
    and distinct-word table — run separately, only the word-count
    exchange is reused while the per-doc map-back aggregation (a
    corpus-sized shuffle) and the broadcast build run once PER family.
    This computes the three per-word maps in one projection over the
    word table and rolls all six totals up in one per-doc
    aggregation: one corpus explode, one broadcast, one map-back
    shuffle. Every column is bit-equal to its standalone operator
    (same per-word expressions, same LONG arithmetic over the same
    rows)."""
    if any(c < 0 for c in vocab.values()) or oov_char_nanos < 0:
        raise ValueError("piece costs must be non-negative")
    if any(len(p) == 0 or len(p) > max_word_len for p in vocab):
        raise ValueError("vocab pieces must be 1..max_word_len chars")
    # r13 (guide §2.3/§2.4): ONE text repartition on the id column
    # replaces BOTH corpus-sized exchanges this pass otherwise pays —
    # the (id, word) count exchange and the per-doc map-back exchange
    # are ClusteredDistribution(id, ...) requirements that
    # HashPartitioning(id) satisfies, so with the compact text rows
    # co-located up front neither aggregation re-exchanges the
    # exploded word rows. Shuffled bytes drop from ~one row per
    # distinct (id, word) plus one per doc to one text row per doc,
    # and the explode runs after the exchange, spread across the
    # cluster instead of pinned to the scan's input splits (locally a
    # sub-MB parquet is ONE split — the whole tokenization ran in a
    # single task). Explicit partition count = defaultParallelism
    # (cluster-adaptive), which AQE keeps as-is.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(n_part, F.col(id_col))
    base = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), WORD_SPLIT_RE)
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    words = base.groupBy("word").agg(F.sum("__c").alias("__wn"))
    bpe_arr = F.split(F.col("word"), "")
    for x, y in merges:
        bpe_arr = _merge_fold(bpe_arr, x, y)
    uv_state = _uv_word_state(F.col("word"), vocab, oov_char_nanos)
    wp_state = _wp_word_state(F.col("word"), vocab, oov_char_nanos)
    long_w = F.length("word") > max_word_len
    word_map = words.select(
        "word",
        # "+ __wn * 0" keeps the count consumed so the word aggregate
        # stays canonical-identical to base's re-aggregation and the
        # corpus exchange is reused (see bpe_apply)
        (F.size(bpe_arr) + F.col("__wn") * F.lit(0)).alias("__bt"),
        F.when(long_w, F.lit(1).cast("long"))
        .otherwise(uv_state % UV_ENC)
        .alias("__ut"),
        F.when(long_w, F.lit(int(longword_nanos)))
        .otherwise(F.shiftright(uv_state, 10))
        .cast("long")
        .alias("__ucost"),
        F.when(long_w, F.lit(1).cast("long"))
        .otherwise(wp_state % UV_ENC)
        .alias("__wt"),
        F.when(long_w, F.lit(int(longword_nanos) // 1000))
        .otherwise(F.shiftright(wp_state, 10))
        .cast("long")
        .alias("__wcost"),
    )
    return (
        base.join(F.broadcast(word_map), "word")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_words"),
            F.sum(F.col("__c") * F.col("__bt")).cast("long").alias(
                "n_bpe_tokens"
            ),
            F.sum(F.col("__c") * F.col("__ut")).cast("long").alias(
                "n_uv_tokens"
            ),
            F.sum(F.col("__c") * F.col("__ucost")).cast("long").alias(
                "uv_cost_nanos"
            ),
            F.sum(F.col("__c") * F.col("__wt")).cast("long").alias(
                "n_wp_tokens"
            ),
            F.sum(F.col("__c") * F.col("__wcost")).cast("long").alias(
                "wp_cost_micros"
            ),
        )
    )


def richness_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary richness + concentration, one exact LONG row — the
    corpus-health companions to :func:`zipf_fit`:

    - ``rich_vocab`` (V), ``rich_tokens`` (N), ``rich_f1`` /
      ``rich_f2`` (singleton / doubleton word counts);
    - ``rich_chao1_nanos``: the bias-corrected Chao1 lower-bound
      estimate of the UNSEEN-inclusive vocabulary size (Chao 1984,
      Chiu 2014 correction — defined even when F2 = 0)::

          chao1 = V + F1*(F1-1) / (2*(F2+1))

      as ``V*1e9 + (F1*(F1-1)*1e9) DIV (2*(F2+1))`` — how much
      vocabulary more crawl would surface. The ``*1e9`` scaling runs
      in DECIMAL(38,0) (r10 advice: ``F1*(F1-1)*1e9`` wraps a LONG
      once F1 exceeds ~96k singletons — real corpora have millions);
      the DuckDB oracle replays it in HUGEINT, bit-equal;
    - ``rich_gini_nanos``: the Gini concentration of word frequencies
      (0 = uniform usage, →1 = a few words dominate). Computed with
      NO word-grain ranking: within a tie class of ``c`` words at
      frequency ``n`` the rank-weighted sum is the closed form
      ``n * (c*offset + c*(c+1) DIV 2)``, so the only ordered pass is
      a cumulative over DISTINCT FREQUENCY CLASSES — a table of
      O(sqrt(N)) rows by Zipf (the bounded-aggregate window
      exception, the zipf_fit precedent)::

          G = (2 * Σ_r r*f_r - (V+1) * N) / (V * N)

      with the numerator's ``*1e9`` scaling and the ``(V+1)*N`` /
      ``V*N`` products in DECIMAL(38,0) (38 digits; never wraps).

    Envelope (honest, r10-advice-corrected): the LONG rank-sum
    accumulator ``Σ_r r*f_r ≤ V*N`` caps the operator at
    ``V*N < 2^63`` ≈ 9.2e18 (e.g. V=1e8 words × N=9.2e10 tokens);
    past that, shard the class table and merge in DECIMAL. The
    ``rich_gini_nanos`` OUTPUT is always in [-1e9, 1e9] so the final
    LONG cast is safe; ``rich_chao1_nanos`` fits a LONG while the
    Chao1 estimate itself is < 9.2e9 distinct words.

    Empty corpus returns all zeros. Tokenization matches
    operators/divergence.py / the vocab family (lowercase, split
    on whitespace, drop empties).
    """
    from pyspark.sql import Window

    wc = (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    classes = wc.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, -1)
    with_off = classes.select(
        "n",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("off"),
    )
    agg = with_off.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("rich_vocab"),
        F.coalesce(F.sum(F.col("n") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("rich_tokens"),
        F.coalesce(F.sum(F.when(F.col("n") == 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("rich_f1"),
        F.coalesce(F.sum(F.when(F.col("n") == 2, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("rich_f2"),
        F.coalesce(
            F.sum(
                F.col("n")
                * (
                    F.col("c") * F.col("off")
                    + F.expr("(c * (c + 1)) DIV 2")
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__rank_sum"),
    )
    return agg.select(
        "rich_vocab",
        "rich_tokens",
        "rich_f1",
        "rich_f2",
        # *1e9 scaling in DECIMAL(38,0): F1*(F1-1)*1e9 wraps a LONG
        # past F1 ≈ 96k; (V+1)*N past V*N ≈ 9.2e9 (r10 advice)
        F.expr(
            "CAST(CAST(rich_vocab AS DECIMAL(38,0)) * 1000000000"
            " + (CAST(rich_f1 AS DECIMAL(38,0)) * (rich_f1 - 1) * 1000000000)"
            "   DIV (2 * (CAST(rich_f2 AS DECIMAL(38,0)) + 1)) AS BIGINT)"
        ).alias("rich_chao1_nanos"),
        F.when(
            (F.col("rich_vocab") > 0) & (F.col("rich_tokens") > 0),
            F.expr(
                "CAST(((2 * CAST(__rank_sum AS DECIMAL(38,0))"
                " - (CAST(rich_vocab AS DECIMAL(38,0)) + 1)"
                "   * CAST(rich_tokens AS DECIMAL(38,0))) * 1000000000)"
                " DIV (CAST(rich_vocab AS DECIMAL(38,0))"
                "      * CAST(rich_tokens AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rich_gini_nanos"),
    )
