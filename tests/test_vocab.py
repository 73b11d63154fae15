"""Tokenizer-training statistics (operators/vocab.py): word
vocabulary and BPE merge-pair counts, DuckDB-replayed exactly on the
sf0.01 documents corpus, cross-checked against a pure-Python BPE
step-1 reference on a hand corpus, with the vocabulary-weighted
scale shape pinned in the plan."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.vocab import (
    bpe_merge_candidates,
    word_vocabulary,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

DOCS = os.path.join(SF_CORRECTNESS, "documents.parquet")


def test_word_vocabulary_matches_duckdb(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    got = [(r["word"], r["n"]) for r in
           word_vocabulary(docs, top_v=40).collect()]
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
            FROM read_parquet('{DOCS}')
        ) WHERE length(word) > 0
        GROUP BY word ORDER BY n DESC, word LIMIT 40
    """).fetchall()
    con.close()
    # the synthetic corpus has a ~31-word vocabulary; both engines
    # must agree on the full (sub-limit) list
    assert got == [tuple(w) for w in want] and len(got) > 20


def test_bpe_pairs_match_duckdb(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    got = [(r["pair"], r["n"]) for r in
           bpe_merge_candidates(docs, top_k=30).collect()]
    con = duckdb.connect()
    want = con.execute(f"""
        WITH words AS (
            SELECT word, COUNT(*) AS wn FROM (
                SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
                FROM read_parquet('{DOCS}')
            ) WHERE length(word) > 0
            GROUP BY word
        ), pairs AS (
            SELECT substr(word, i, 2) AS pair, wn
            FROM words, LATERAL (
                SELECT unnest(generate_series(1, length(word) - 1)) AS i
            )
            WHERE length(word) >= 2
        )
        SELECT pair, CAST(SUM(wn) AS BIGINT) AS n
        FROM pairs GROUP BY pair ORDER BY n DESC, pair LIMIT 30
    """).fetchall()
    con.close()
    assert got == [tuple(w) for w in want] and len(got) == 30


def test_bpe_pairs_equal_python_reference(spark):
    """Hand corpus vs the textbook step-1 reference: count adjacent
    char pairs of every word occurrence."""
    texts = ["low low lower", "newest newest widest", "low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in
           bpe_merge_candidates(df, top_k=1000).collect()}
    ref: dict = {}
    for t in texts:
        for w in t.lower().split():
            for a, b in zip(w, w[1:]):
                ref[a + b] = ref.get(a + b, 0) + 1
    assert got == ref
    # 'lo'/'ow' appear in low(x3) + lower(x1) = 4 each
    assert got["lo"] == 4 and got["ow"] == 4
    # 'es' appears in newest(x2) + widest(x1) = 3
    assert got["es"] == 3


def test_vocab_weighted_shape_and_plan(spark):
    """The pair explode must run over the DISTINCT-word table (one
    corpus-side explode only), and top selection must be
    TakeOrderedAndProject — never a global sort."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    df = bpe_merge_candidates(docs, top_k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    # exactly two Generate (explode) DEFINITIONS: the corpus word
    # explode and the vocab pair explode
    assert plan.count("(") > 0 and plan.count("Generate") >= 2
    v = word_vocabulary(docs, top_v=5)
    plan_v = v._sc._jvm.PythonSQLUtils.explainString(
        v._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan_v
    with pytest.raises(ValueError):
        word_vocabulary(docs, top_v=0)
    with pytest.raises(ValueError):
        bpe_merge_candidates(docs, top_k=0)


def test_single_char_and_empty_words_are_safe(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "  "), (2, "xy")],
        "doc_id long, text string",
    )
    pairs = {r["pair"]: r["n"] for r in
             bpe_merge_candidates(df, top_k=10).collect()}
    assert pairs == {"xy": 1}  # 1-char words contribute no pairs
    vocab = {r["word"]: r["n"] for r in word_vocabulary(df, top_v=10).collect()}
    assert vocab == {"a": 1, "b": 1, "c": 1, "xy": 1}


def test_zipf_fit_matches_pure_python(spark):
    """Exact normal-equation LONGs vs a pure-Python mirror of the
    micro-snapped OLS on a hand corpus with a known rank order."""
    import math

    from lakehouse_file_format_compare_spark.operators.vocab import zipf_fit

    # frequencies: aa x6, bb x3, cc x2, dd x1 (ranks 1..4)
    text = " ".join(["aa"] * 6 + ["bb"] * 3 + ["cc"] * 2 + ["dd"])
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = zipf_fit(df, top_r=10).collect()[0]

    pts = [(1, 6), (2, 3), (3, 2), (4, 1)]
    xs = [math.floor(math.log(r) * 1_000_000 + 0.5) for r, _ in pts]
    ys = [math.floor(math.log(n) * 1_000_000 + 0.5) for _, n in pts]
    k = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = k * sxy - sx * sy, k * sxx - sx * sx
    assert (got.zipf_terms, got.zipf_num, got.zipf_den) == (k, num, den)
    assert got.zipf_slope_grid == math.floor(num / den * 1_000_000 + 0.5)
    # a 6/3/2/1 frequency ladder is Zipf-ish: slope must be near -1
    assert -1_400_000 < got.zipf_slope_grid < -800_000


def test_zipf_degenerate_single_term_is_zero(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import zipf_fit

    df = spark.createDataFrame(
        [(0, "same same same")], "doc_id long, text string"
    )
    got = zipf_fit(df).collect()[0]
    assert got.zipf_terms == 1
    assert got.zipf_den == 0
    assert got.zipf_slope_grid == 0


def test_zipf_layout_invariance(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import zipf_fit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = zipf_fit(docs.repartition(1)).collect()[0]
    b = zipf_fit(docs.repartition(9, "source")).collect()[0]
    assert a.asDict() == b.asDict()
    # natural-ish corpus: negative slope
    assert a.zipf_slope_grid < 0


# --- distinct-n corpus diversity (r10, text_fingerprints widening) ---

def test_distinct_n_hand_fixture(spark):
    """Known corpus → known distinct-n counts; docs shorter than n
    contribute no n-grams to either side of the ratio."""
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        _distinct_n_scalars,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "  ")],
        "doc_id long, text string",
    )
    row = _distinct_n_scalars(docs).collect()[0]
    # unigrams: a b a b | a b | c -> total 7, distinct {a,b,c}=3
    assert row.dn1_total == 7 and row.dn1_distinct == 3
    # bigrams: (a b)(b a)(a b) | (a b) -> total 4, distinct {a b, b a}=2
    assert row.dn2_total == 4 and row.dn2_distinct == 2
    # trigrams: (a b a)(b a b) -> total 2, distinct 2 (doc 2/3 too short)
    assert row.dn3_total == 2 and row.dn3_distinct == 2
    assert row.dn1_nanos == 3 * 10**9 // 7
    assert row.dn2_nanos == 2 * 10**9 // 4
    assert row.dn3_nanos == 10**9
    # repetition sensitivity: duplicating the corpus doubles totals,
    # keeps distincts — ratios halve (floor division)
    row2 = _distinct_n_scalars(docs.unionAll(
        docs.select((docs.doc_id + 10).alias("doc_id"), "text")
    )).collect()[0]
    assert row2.dn1_total == 14 and row2.dn1_distinct == 3
    assert row2.dn2_nanos == 2 * 10**9 // 8


def test_distinct_n_plan_is_jvm_side(spark):
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        _distinct_n_scalars,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    df = _distinct_n_scalars(table(spark, "/root/testdata/sf0.001", "documents"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --- unigram-LM tokenizer (r10 late-round) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

UV_TEST_VOCAB = {
    "th": 2_000_000_000, "the": 2_300_000_000, "da": 2_100_000_000,
    "ta": 2_050_000_000, "data": 3_000_000_000, "a": 3_500_000_000,
    "e": 3_400_000_000,
}
UV_OOV = 5_000_000_000
UV_LONG = 50_000_000_000


def _py_viterbi(word, vocab, oov, longword, max_word_len=12):
    """(n_tokens, cost): min (cost, tokens) lexicographic over all
    segmentations into vocab pieces + OOV single chars."""
    if len(word) > max_word_len:
        return 1, longword
    max_l = max((len(p) for p in vocab), default=1)
    best = [None] * (len(word) + 1)
    best[0] = (0, 0)
    for j in range(1, len(word) + 1):
        cands = []
        for l in range(1, min(j, max_l) + 1):
            c = vocab.get(word[j - l:j])
            if c is None and l == 1:
                c = oov
            if c is None:
                continue
            pc, pt = best[j - l]
            cands.append((pc + c, pt + 1))
        best[j] = min(cands)
    return best[len(word)][1], best[len(word)][0]


def test_unigram_apply_hand_and_longword(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
    )

    texts = [
        (1, "the data table"),
        (2, "thedata e a"),
        (3, "supercalifragilistic x"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_uv_tokens, r.uv_cost_nanos)
        for r in unigram_apply(docs, UV_TEST_VOCAB, UV_OOV, UV_LONG).collect()
    }
    want = {}
    for did, text in texts:
        ws = [w for w in text.lower().split() if w]
        nt = sum(_py_viterbi(w, UV_TEST_VOCAB, UV_OOV, UV_LONG)[0] for w in ws)
        c = sum(_py_viterbi(w, UV_TEST_VOCAB, UV_OOV, UV_LONG)[1] for w in ws)
        want[did] = (len(ws), nt, c)
    assert got == want
    # the 20-char word took the long-word envelope: exactly 1 token
    assert got[3] == (2, 2, UV_LONG + UV_OOV)


def test_unigram_piece_stats_matches_python(spark):
    import collections

    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_piece_stats,
    )

    texts = ["the data table", "thedata e a"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.piece, r.n) for r in unigram_piece_stats(docs, top_k=8).collect()]
    cnt = collections.Counter()
    words = collections.Counter(
        w for t in texts for w in t.lower().split() if w
    )
    for w, nn in words.items():
        for l in range(1, 5):
            for i in range(len(w) - l + 1):
                cnt[w[i:i + l]] += nn
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert got == want


def test_unigram_apply_validates_model(spark):
    import pytest

    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
    )

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram_apply(docs, {"a": -1})
    with pytest.raises(ValueError):
        unigram_apply(docs, {"": 5})


def test_unigram_apply_corpus_touched_once(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table as _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    df = unigram_apply(docs, UV_TEST_VOCAB, UV_OOV, UV_LONG)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


_UV_WORD = st.text(alphabet="dateh", min_size=1, max_size=14)
_UV_PIECE = st.text(alphabet="dateh", min_size=1, max_size=4)
_UV_COSTS = st.integers(min_value=0, max_value=10_000_000_000)


@given(
    words=st.lists(_UV_WORD, min_size=1, max_size=5, unique=True),
    vocab=st.dictionaries(_UV_PIECE, _UV_COSTS, min_size=0, max_size=6),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_unigram_viterbi_matches_python_reference(spark, words, vocab):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
    )

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_uv_tokens, r.uv_cost_nanos)
        for r in unigram_apply(docs, vocab, UV_OOV, UV_LONG).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_viterbi(w, vocab, UV_OOV, UV_LONG), (w, vocab)


# --- WordPiece greedy longest-match (r10 late-round) ---

def _py_greedy(word, vocab, oov, longword, max_word_len=12):
    if len(word) > max_word_len:
        return 1, longword // 1000
    max_l = max((len(p) for p in vocab), default=1)
    pos, nt, cost = 0, 0, 0
    while pos < len(word):
        for l in range(min(max_l, len(word) - pos), 0, -1):
            c = vocab.get(word[pos:pos + l])
            if c is None and l == 1:
                c = oov
            if c is not None:
                cost += c // 1000
                nt += 1
                pos += l
                break
    return nt, cost


def test_wordpiece_apply_hand_and_longword(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        wordpiece_apply,
    )

    texts = [(1, "the data table"), (2, "thedata e a"),
             (3, "supercalifragilistic x"), (4, "dat")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_wp_tokens, r.wp_cost_micros)
        for r in wordpiece_apply(docs, UV_TEST_VOCAB, UV_OOV, UV_LONG).collect()
    }
    want = {}
    for did, text in texts:
        ws = [w for w in text.lower().split() if w]
        want[did] = (
            len(ws),
            sum(_py_greedy(w, UV_TEST_VOCAB, UV_OOV, UV_LONG)[0] for w in ws),
            sum(_py_greedy(w, UV_TEST_VOCAB, UV_OOV, UV_LONG)[1] for w in ws),
        )
    assert got == want


def test_wordpiece_greedy_is_a_cost_trap_viterbi_escapes(spark):
    """The documented greedy/optimal divergence, pinned as data: with
    'ab' cheap, 'abc' expensive, and 'c' OOV-only, greedy on 'abc'
    grabs 'abc' (longest match) while Viterbi picks 'ab'+'c' when
    that is cheaper — the uv_*/wp_* driver delta comes from exactly
    this shape."""
    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
        wordpiece_apply,
    )

    vocab = {"ab": 1_000_000_000, "abc": 9_000_000_000, "c": 2_000_000_000}
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    wp = wordpiece_apply(docs, vocab, UV_OOV, UV_LONG).collect()[0]
    uv = unigram_apply(docs, vocab, UV_OOV, UV_LONG).collect()[0]
    assert wp.n_wp_tokens == 1 and wp.wp_cost_micros == 9_000_000
    assert uv.n_uv_tokens == 2 and uv.uv_cost_nanos == 3_000_000_000
    assert uv.uv_cost_nanos // 1000 < wp.wp_cost_micros


@given(
    words=st.lists(_UV_WORD, min_size=1, max_size=5, unique=True),
    vocab=st.dictionaries(_UV_PIECE, _UV_COSTS, min_size=0, max_size=6),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_wordpiece_matches_python_reference(spark, words, vocab):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        wordpiece_apply,
    )

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_wp_tokens, r.wp_cost_micros)
        for r in wordpiece_apply(docs, vocab, UV_OOV, UV_LONG).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _py_greedy(w, vocab, UV_OOV, UV_LONG), (w, vocab)


def test_richness_report_matches_counter_mirror(spark):
    """Chao1 + Gini vs a pure-Python Counter mirror, including the
    degenerate regimes (all singletons, one word, empty/null)."""
    from collections import Counter

    from lakehouse_file_format_compare_spark.operators.vocab import (
        richness_report,
    )

    def mirror(texts):
        c = Counter(
            w
            for t in texts
            if t
            for w in t.lower().strip().split()
            if w
        )
        V, N = len(c), sum(c.values())
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        chao1 = V * 10**9 + (f1 * (f1 - 1) * 10**9) // (2 * (f2 + 1))
        if V == 0 or N == 0:
            return (0, 0, 0, 0, 0, 0)
        freqs = sorted(c.values())
        rank_sum = sum((i + 1) * f for i, f in enumerate(freqs))
        gini = ((2 * rank_sum - (V + 1) * N) * 10**9) // (V * N)
        return (V, N, f1, f2, chao1, gini)

    cases = [
        ["a a a b b c", "d e f"],
        ["same same same same"],
        ["x y z w v u t s r q"],
        [],
        [None, "  "],
        ["one two two three three three four four four four"],
    ]
    for texts in cases:
        df = spark.createDataFrame(
            [(j, t) for j, t in enumerate(texts)] or [],
            "doc_id long, text string",
        )
        r = richness_report(df).collect()[0]
        got = (
            r.rich_vocab,
            r.rich_tokens,
            r.rich_f1,
            r.rich_f2,
            r.rich_chao1_nanos,
            r.rich_gini_nanos,
        )
        assert got == mirror(texts), (texts, got)


def test_richness_survives_f1_past_long_wrap(spark):
    """r10 advice (medium): F1*(F1-1)*1e9 wraps a LONG once F1 >
    ~96k singletons. 120k singletons + 16 doubletons keeps the Chao1
    OUTPUT inside the documented LONG envelope while the old plain-
    BIGINT intermediate (1.44e19 * 1e9) silently wrapped; the
    DECIMAL(38,0) path must produce the exact integer."""
    from lakehouse_file_format_compare_spark.operators.vocab import (
        richness_report,
    )

    n_single, n_double = 120_000, 16
    per_doc = 1000
    docs = spark.range(n_single // per_doc).selectExpr(
        "id AS doc_id",
        f"array_join(transform(sequence(0, {per_doc - 1}),"
        f" i -> concat('w', id * {per_doc} + i)), ' ') AS text",
    ).unionByName(
        spark.range(1).selectExpr(
            "id + 1000000 AS doc_id",
            f"array_join(flatten(transform(sequence(0, {n_double - 1}),"
            f" i -> array(concat('d', i), concat('d', i)))), ' ') AS text",
        )
    )
    r = richness_report(docs).collect()[0]
    V = n_single + n_double
    N = n_single + 2 * n_double
    f1, f2 = n_single, n_double
    chao1 = V * 10**9 + (f1 * (f1 - 1) * 10**9) // (2 * (f2 + 1))
    assert (r.rich_vocab, r.rich_tokens, r.rich_f1, r.rich_f2) == (V, N, f1, f2)
    assert r.rich_chao1_nanos == chao1
    # singleton-dominated corpus: frequencies near-uniform, Gini ~ 0+
    assert 0 <= r.rich_gini_nanos < 10**8


def test_richness_gini_bounds_and_monotonicity(spark):
    """Gini is 0 for uniform usage and strictly grows as one word
    takes over; Chao1 is always >= V."""
    from lakehouse_file_format_compare_spark.operators.vocab import (
        richness_report,
    )

    uniform = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], "doc_id long, text string"
    )
    r_u = richness_report(uniform).collect()[0]
    assert r_u.rich_gini_nanos == 0
    skewed = spark.createDataFrame(
        [(1, " ".join(["a"] * 50 + ["b", "c", "d", "e"]))],
        "doc_id long, text string",
    )
    r_s = richness_report(skewed).collect()[0]
    assert r_s.rich_gini_nanos > 500_000_000
    assert r_s.rich_chao1_nanos >= r_s.rich_vocab * 10**9


def test_richness_is_layout_invariant(spark):
    from lakehouse_file_format_compare_spark.operators.vocab import (
        richness_report,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    a = richness_report(docs).collect()[0]
    b = richness_report(docs.repartition(17, "source")).collect()[0]
    assert a == b
