"""Bigram-LM perplexity quality filter (operators/lm.py): exact
fixed-point semantics vs a pure-Python reference, degenerate inputs,
partition-layout invariance, the planted-gibberish flag contract,
and the driver widening's oracle replay at smoke scale."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.lm import (
    BOS,
    NANO,
    SMOOTH_K,
    THETA_NANOS,
    bigram_lm_score,
    bigram_lm_train,
    flag_high_perplexity,
    perplexity_report,
)

from .conftest import SF_SMOKE


def _py_reference(rows, train_pred):
    """Pure-Python add-k bigram LM with the operator's exact
    nano-snap arithmetic. rows: (doc_id, text, lang)."""

    def toks(t):
        return [w for w in re.split(r"\s+", t.strip().lower()) if w]

    cnt, ctx_cnt, vocab = Counter(), Counter(), set()
    for _, t, lang in rows:
        if not train_pred(lang):
            continue
        prev = BOS
        for w in toks(t):
            cnt[(prev, w)] += 1
            ctx_cnt[prev] += 1
            vocab.add(w)
            prev = w
    v = len(vocab)
    out = {}
    for did, t, _ in rows:
        prev, lp, nb = BOS, 0, 0
        for w in toks(t):
            num = cnt.get((prev, w), 0) + SMOOTH_K
            den = ctx_cnt.get(prev, 0) + SMOOTH_K * v
            if den > 0:  # degenerate empty model scores 0
                lp += math.floor(math.log(num / den) * NANO + 0.5)
            nb += 1
            prev = w
        out[did] = (nb, lp)
    return out, v, len(cnt)


ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "the quick brown dog sleeps", "en"),
    (2, "a lazy fox jumps", "en"),
    (3, "", "en"),
    (4, "   \t  ", "en"),
    (5, "der schnelle braune fuchs springt", "de"),
    (6, "the the the the", "en"),
    (7, "zzqx vvwp qqrr kklm zzqx", "xx"),  # gibberish: all-unseen
]


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string"
    )


def test_scores_match_pure_python_reference(spark, fixture_docs):
    model, ctx_totals, vocab = bigram_lm_train(
        fixture_docs.where(F.col("lang") == "en")
    )
    got = {
        r.doc_id: (r.n_bigrams, r.lp_nanos)
        for r in bigram_lm_score(
            fixture_docs, model, ctx_totals, vocab
        ).collect()
    }
    want, v, model_rows = _py_reference(ROWS, lambda lang: lang == "en")
    assert got == want
    assert vocab.collect()[0].v == v
    assert model.count() == model_rows


def test_empty_and_whitespace_docs_score_zero(spark, fixture_docs):
    model, ctx_totals, vocab = bigram_lm_train(
        fixture_docs.where(F.col("lang") == "en")
    )
    scored = flag_high_perplexity(
        bigram_lm_score(fixture_docs, model, ctx_totals, vocab)
    )
    rows = {r.doc_id: r for r in scored.collect()}
    for did in (3, 4):
        assert rows[did].n_bigrams == 0
        assert rows[did].lp_nanos == 0
        assert rows[did].flagged is False


def test_planted_gibberish_is_flagged(spark, fixture_docs):
    """Doc 7 is pure out-of-vocabulary noise: every token after the
    first hits the wholly-unseen-context floor ln(1/V) and the first
    pays the dense-BOS penalty, so a threshold set between the
    in-distribution scores and the OOV floor (the fixture's
    vocabulary is tiny, so THETA_NANOS itself doesn't apply — the
    default is calibrated to the testdata corpus) must separate it
    from every train doc."""
    want, _, _ = _py_reference(ROWS, lambda lang: lang == "en")
    avg = {d: -lp / nb for d, (nb, lp) in want.items() if nb > 0}
    train_worst = max(avg[d] for d in (0, 1, 2, 6))
    assert avg[7] > train_worst  # the planted doc is separable at all
    theta = int((avg[7] + train_worst) / 2)

    model, ctx_totals, vocab = bigram_lm_train(
        fixture_docs.where(F.col("lang") == "en")
    )
    scored = flag_high_perplexity(
        bigram_lm_score(fixture_docs, model, ctx_totals, vocab),
        theta_nanos=theta,
    )
    rows = {r.doc_id: r for r in scored.collect()}
    assert rows[7].flagged is True
    # fully in-distribution documents stay below the threshold
    for did in (0, 1, 2, 6):
        assert rows[did].flagged is False


def test_flag_is_exact_integer_compare(spark, fixture_docs):
    """The flag must be decided by lp < -theta * nb (long arithmetic),
    never a double division — replay it directly on the scores."""
    model, ctx_totals, vocab = bigram_lm_train(
        fixture_docs.where(F.col("lang") == "en")
    )
    scored = flag_high_perplexity(
        bigram_lm_score(fixture_docs, model, ctx_totals, vocab)
    )
    for r in scored.collect():
        assert r.flagged == (
            r.n_bigrams > 0 and r.lp_nanos < -THETA_NANOS * r.n_bigrams
        )


def test_layout_invariance(spark):
    """LONG sums of nano-snapped terms: the report is bit-identical
    under any partition layout of the input."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pred = F.col("lang") == "en"
    a = perplexity_report(docs.repartition(1), pred).collect()[0]
    b = perplexity_report(docs.repartition(13, "lang"), pred).collect()[0]
    assert a.asDict() == b.asDict()


def test_report_discriminates_on_testdata(spark):
    """The en-trained model must flag out-of-slice docs at a higher
    absolute count than reference-slice docs on the real corpus (the
    CCNet discrimination property, with THETA_NANOS calibrated so the
    train slice is near-clean at smoke scale)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rep = perplexity_report(docs, F.col("lang") == "en").collect()[0]
    assert rep.lm_flagged_other > rep.lm_flagged_train_grp
    assert rep.lm_flagged_docs == (
        rep.lm_flagged_train_grp + rep.lm_flagged_other
    )
    assert rep.lm_scored_docs > 0
    assert rep.lm_tokens > 0


def test_plan_has_no_python_and_single_corpus_explode(spark):
    """Scoring path: JVM-only (no BatchEvalPython / row UDFs) and
    exactly one Generate per corpus-sized frame (the bigram explode);
    the model-side joins are explode-reaggregations, not rescans."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rep = perplexity_report(docs, F.col("lang") == "en")
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


# --- hypothesis sweep: arbitrary corpora match the pure-Python LM ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORD = st.text(
    alphabet=st.sampled_from("ab \t"), min_size=0, max_size=24
)


@given(texts=st.lists(_WORD, min_size=1, max_size=6),
       train_mask=st.lists(st.booleans(), min_size=6, max_size=6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)
def test_scores_match_reference_on_arbitrary_corpora(
    spark, texts, train_mask
):
    """Any corpus (tiny alphabet forces heavy bigram collisions,
    whitespace-only and empty docs included) + any train slice:
    the operator's exact LONG scores equal the pure-Python mirror."""
    rows = [
        (i, t, "en" if train_mask[i] else "xx")
        for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model, ctx_totals, vocab = bigram_lm_train(
        docs.where(F.col("lang") == "en")
    )
    got = {
        r.doc_id: (r.n_bigrams, r.lp_nanos)
        for r in bigram_lm_score(docs, model, ctx_totals, vocab).collect()
    }
    want, _, _ = _py_reference(rows, lambda lang: lang == "en")
    assert got == want


# ---------------------------------------------------------------------------
# Trigram stupid backoff (r11)
# ---------------------------------------------------------------------------


def _py_sb_reference(rows, train_pred):
    """Pure-Python stupid-backoff trigram LM with the operator's exact
    integer arithmetic (nano-snapped ln ratios + the precomputed
    LN_ALPHA_NANOS penalty per backoff level)."""
    from lakehouse_file_format_compare_spark.operators.lm import (
        LN_ALPHA_NANOS,
    )

    def toks(t):
        return [w for w in re.split(r"\s+", t.strip().lower()) if w]

    tri, trictx, bi, bictx, uni = (
        Counter(), Counter(), Counter(), Counter(), Counter()
    )
    for _, t, lang in rows:
        if not train_pred(lang):
            continue
        ws = toks(t)
        for i, w in enumerate(ws):
            c2 = ws[i - 2] if i >= 2 else BOS
            c1 = ws[i - 1] if i >= 1 else BOS
            tri[(c2, c1, w)] += 1
            trictx[(c2, c1)] += 1
            bi[(c1, w)] += 1
            bictx[c1] += 1
            uni[w] += 1
    n, v = sum(uni.values()), len(uni)
    out = {}
    for did, t, _ in rows:
        ws = toks(t)
        lp, h3, h2, h1 = 0, 0, 0, 0
        for i, w in enumerate(ws):
            c2 = ws[i - 2] if i >= 2 else BOS
            c1 = ws[i - 1] if i >= 1 else BOS
            if (c2, c1, w) in tri:
                lp += math.floor(
                    math.log(tri[(c2, c1, w)] / trictx[(c2, c1)]) * NANO
                    + 0.5
                )
                h3 += 1
            elif (c1, w) in bi:
                lp += (
                    math.floor(
                        math.log(bi[(c1, w)] / bictx[c1]) * NANO + 0.5
                    )
                    + LN_ALPHA_NANOS
                )
                h2 += 1
            else:
                den = n + SMOOTH_K * v
                if den > 0:
                    lp += math.floor(
                        math.log((uni.get(w, 0) + SMOOTH_K) / den) * NANO
                        + 0.5
                    )
                lp += 2 * LN_ALPHA_NANOS
                h1 += 1
        out[did] = (len(ws), lp, h3, h2, h1)
    return out, n, v, len(tri), len(bi)


def test_sb_scores_match_pure_python_reference(spark, fixture_docs):
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_score,
        stupid_backoff_train,
    )

    parts = stupid_backoff_train(fixture_docs.where(F.col("lang") == "en"))
    got = {
        r.doc_id: (r.n_tokens, r.sb_nanos, r.n_hit3, r.n_hit2, r.n_hit1)
        for r in stupid_backoff_score(fixture_docs, *parts).collect()
    }
    want, n, v, tri_rows, bi_rows = _py_sb_reference(
        ROWS, lambda lang: lang == "en"
    )
    assert got == want
    tri, trictx, bi, bictx, uni, totals = parts
    tot = totals.collect()[0]
    assert (tot.n, tot.v) == (n, v)
    assert tri.count() == tri_rows and bi.count() == bi_rows


def test_sb_backoff_levels_and_monotone_penalty(spark, fixture_docs):
    """A doc made of seen trigrams scores all-hit3; one with only
    seen bigrams backs off once per token; gibberish lands on the
    unigram floor twice-penalized — and per-token scores order
    hit3 > hit2 > hit1 on this fixture."""
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_score,
        stupid_backoff_train,
    )

    parts = stupid_backoff_train(fixture_docs.where(F.col("lang") == "en"))
    probes = spark.createDataFrame(
        [
            (100, "the quick brown fox"),       # seen trigrams (doc 0)
            (101, "dog sleeps"),                # "dog sleeps" bigram seen,
                                                # trigram ctx (<s>,dog) unseen
            (102, "zzqx vvwp"),                 # pure OOV
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in stupid_backoff_score(probes, *parts).collect()
    }
    assert got[100].n_hit3 == 4 and got[100].n_hit2 == 0
    assert got[101].n_hit2 >= 1
    assert got[102].n_hit1 == 2 and got[102].n_hit3 == 0
    per_tok = {k: r.sb_nanos / r.n_tokens for k, r in got.items()}
    assert per_tok[100] > per_tok[102]


def test_sb_empty_train_and_empty_docs(spark, fixture_docs):
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_score,
        stupid_backoff_train,
        LN_ALPHA_NANOS,
    )

    parts = stupid_backoff_train(
        fixture_docs.where(F.col("lang") == "nope")
    )
    got = {
        r.doc_id: (r.n_tokens, r.sb_nanos)
        for r in stupid_backoff_score(fixture_docs, *parts).collect()
    }
    assert got[3] == (0, 0) and got[4] == (0, 0)
    # degenerate model: every token takes only the double penalty
    nb = len("the quick brown dog sleeps".split())
    assert got[1] == (nb, nb * 2 * LN_ALPHA_NANOS)


def test_sb_report_discriminates_on_testdata(spark):
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_report,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_SMOKE, "documents")
    r = stupid_backoff_report(docs, F.col("lang") == "en").collect()[0]
    assert r.sb_train_docs > 0 and r.sb_vocab > 0
    assert r.sb_tri_rows >= r.sb_bi_rows > 0
    assert r.sb_tokens > 0 and r.sb_hit3 + r.sb_hit2 + r.sb_hit1 == r.sb_tokens
    # the flag must discriminate: no in-slice doc flagged, some
    # out-of-slice docs flagged (threshold calibrated for this corpus)
    assert r.sb_flagged_train_grp == 0
    assert r.sb_flagged_other > 0


@given(texts=st.lists(_WORD, min_size=1, max_size=6),
       train_n=st.integers(min_value=0, max_value=3))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_sb_scores_match_reference_on_arbitrary_corpora(
    spark, texts, train_n
):
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_score,
        stupid_backoff_train,
    )

    rows = [
        (i, t, "en" if i < train_n else "xx") for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    parts = stupid_backoff_train(df.where(F.col("lang") == "en"))
    got = {
        r.doc_id: (r.n_tokens, r.sb_nanos, r.n_hit3, r.n_hit2, r.n_hit1)
        for r in stupid_backoff_score(df, *parts).collect()
    }
    want, *_ = _py_sb_reference(rows, lambda lang: lang == "en")
    assert got == want
