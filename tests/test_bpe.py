"""BPE train + apply (operators/vocab.py, r10 — the apply half of
the tokenizer family, r9 verdict #5): greedy left-to-right merge
semantics on hand fixtures; deterministic training on a tiny corpus;
full DuckDB value oracles for apply and token usage under a FIXED
merge list (the chained-replace replay — string replace is
non-overlapping left-to-right, exactly the fold's semantics); the
corpus-touched-once plan pin."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.vocab import (
    bpe_apply,
    bpe_token_usage,
    bpe_train,
    word_bpe_tokens,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_CORRECTNESS

MERGES = [("t", "h"), ("th", "e"), ("a", "t"), ("d", "at"), ("e", "r")]


def _duck_enc(merges) -> str:
    """Chained-replace DuckDB tokenizer over '<c>' encoded words."""
    expr = r"regexp_replace(word, '(.)', '<\1>', 'g')"
    for x, y in merges:
        expr = f"replace({expr}, '<{x}><{y}>', '<{x}{y}>')"
    return expr


def test_merge_fold_hand_cases(spark):
    df = spark.createDataFrame(
        [("the",), ("theater",), ("data",), ("aaa",), ("x",), ("tht",)],
        "word string",
    )
    got = {
        r.word: list(r.tokens)
        for r in word_bpe_tokens(df, MERGES).collect()
    }
    assert got["the"] == ["the"]
    # 'theater': th+e -> the, a+t -> at ... merges apply in ORDER:
    # (t,h): the|ater -> th,e,a,t,e,r; (th,e): the,a,t,e,r;
    # (a,t): the,at,e,r; (d,at): no d; (e,r): the,at,er
    assert got["theater"] == ["the", "at", "er"]
    # 'data': (a,t) gives d,at,a then (d,at) -> dat,a
    assert got["data"] == ["dat", "a"]
    assert got["aaa"] == ["a", "a", "a"]  # no (a,a) merge in the list
    assert got["x"] == ["x"]
    # greedy left-to-right: t,h,t -> th,t (the merged 'th' cannot
    # re-merge as 't' in the same pass)
    assert got["tht"] == ["th", "t"]


def test_greedy_nonoverlap(spark):
    df = spark.createDataFrame([("aaaa",), ("aaa",)], "word string")
    got = {
        r.word: list(r.tokens)
        for r in word_bpe_tokens(df, [("a", "a")]).collect()
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_train_deterministic_tiny_corpus(spark):
    """'low lower lowest low low': pair (l,o) and (o,w) both occur 5x
    (weighted by word frequency: low x3, lower, lowest); tie breaks
    to (l,o). After merging, (lo,w) occurs 5x and wins round 2."""
    docs = spark.createDataFrame(
        [(0, "low lower lowest low low")], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # round 3: within 'lower'/'lowest' (freq 1 each) pairs (low,e) 2x,
    # (e,r) 1x, (e,s) 1x, (s,t) 1x -> (low,e)
    assert merges[2] == ("low", "e")


def test_train_stops_when_dry(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    # every pair occurs once -> below the min count of 2 -> no merges
    assert merges == []


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_CORRECTNESS}/documents.parquet')"
    )
    yield con
    con.close()


def test_corpus_has_no_reserved_delimiters(spark):
    """The DuckDB replay encodes symbols as '<s>'; the equivalence
    assumes the corpus contains neither bracket (operator docstring).
    Pin that precondition on the testdata."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    n = docs.where(F.col("text").rlike("[<>]")).count()
    assert n == 0


def test_bpe_apply_duckdb_value_oracle(spark, duck):
    """Per-doc (n_words, n_bpe_tokens) under a merge list TRAINED on
    the same corpus — trained Spark-side (plain literals), replayed
    verbatim in SQL."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    merges = bpe_train(docs, n_merges=6)
    assert len(merges) == 6  # sf0.01 corpus is rich enough
    got = sorted(
        (r.doc_id, r.n_words, r.n_bpe_tokens)
        for r in bpe_apply(docs, merges).collect()
    )
    sql = f"""
    WITH per_doc AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    ), words AS (
        SELECT doc_id, word FROM per_doc WHERE length(word) > 0
    ), toks AS (
        SELECT doc_id, word,
               length(regexp_replace({_duck_enc(merges)}, '[^<]', '', 'g')) AS nt
        FROM words
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nt) AS BIGINT) AS n_bpe_tokens
    FROM toks GROUP BY doc_id
    """
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_bpe_token_usage_duckdb_value_oracle(spark, duck):
    docs = table(spark, SF_CORRECTNESS, "documents")
    merges = bpe_train(docs, n_merges=6)
    got = [(r.token, r.n) for r in bpe_token_usage(docs, merges, top_k=20).collect()]
    sql = f"""
    WITH words AS (
        SELECT word, COUNT(*) AS wn FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
            FROM documents
        ) WHERE length(word) > 0 GROUP BY word
    ), toks AS (
        SELECT wn,
               unnest(string_split(
                   substr(e, 2, length(e) - 2), '><')) AS token
        FROM (SELECT wn, {_duck_enc(merges)} AS e FROM words)
    )
    SELECT token, CAST(SUM(wn) AS BIGINT) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want and len(got) == 20


def test_bpe_apply_corpus_touched_once(spark):
    """The (id, word) exchange is built once and re-aggregated by both
    consumers (word map + per-doc rollup). Exchange reuse fires in
    AQE's FINAL plan (runtime stage reuse — the divergence pin's
    mechanism), so execute first, then assert; without the
    count-consuming word branch (see bpe_apply) the subtrees differ
    and the corpus is genuinely scanned twice."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    df = bpe_apply(docs, MERGES)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_apply_conserves_word_count(spark):
    """n_words must equal the raw whitespace token count per doc, and
    n_bpe_tokens <= n_chars (a merge never splits) while >= n_words."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    merges = bpe_train(docs, n_merges=4)
    out = bpe_apply(docs, merges)
    bad = out.where(
        (F.col("n_bpe_tokens") < F.col("n_words"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Property tests: the Spark aggregate fold vs a pure-Python reference
# BPE apply (greedy left-to-right non-overlapping, merges in order) —
# arbitrary words over a 3-letter alphabet × arbitrary merge lists,
# including pathological self-overlapping merges like (a, a) and
# merges whose output feeds later merges.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_bpe(word: str, merges) -> list[str]:
    syms = list(word)
    for x, y in merges:
        out = []
        for s in syms:
            if out and out[-1] == x and s == y:
                out[-1] = x + y
            else:
                out.append(s)
        syms = out
    return syms


_WORD = st.text(alphabet="abc", min_size=1, max_size=8)
_SYM = st.text(alphabet="abc", min_size=1, max_size=2)
_MERGES = st.lists(st.tuples(_SYM, _SYM), min_size=0, max_size=4)


@given(words=st.lists(_WORD, min_size=1, max_size=6, unique=True), merges=_MERGES)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_fold_matches_python_reference(spark, words, merges):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: list(r.tokens) for r in word_bpe_tokens(df, merges).collect()}
    for w in words:
        assert got[w] == _py_bpe(w, merges), (w, merges)


def test_tokenizer_pipeline_row_shape_and_ordering(spark):
    """tokenizer_pipeline (r11): three family rows; the greedy
    WordPiece budget can never beat the optimal Viterbi budget under
    the SAME trained model/cost scale (greedy >= optimal per word,
    summed); the trained BPE merge list is non-trivial and the model
    descriptions are consistent between the unigram and WordPiece
    rows (one shared trained vocab)."""
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        TP_BPE_MERGES,
        TP_UV_K,
        tokenizer_pipeline,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.family: r for r in tokenizer_pipeline(spark, SF_SMOKE).collect()}
    assert set(rows) == {"bpe", "unigram", "wordpiece"}
    b, u, w = rows["bpe"], rows["unigram"], rows["wordpiece"]
    assert b.model_size == TP_BPE_MERGES
    assert len(b.model_desc.split()) == TP_BPE_MERGES
    assert all("+" in m for m in b.model_desc.split())
    assert u.model_size == w.model_size <= TP_UV_K
    assert u.model_desc == w.model_desc
    assert b.cost_nanos == 0
    # optimal (Viterbi) <= greedy (WordPiece) on the shared cost scale
    assert 0 < u.cost_nanos <= w.cost_nanos
    assert u.tokens > 0 and w.tokens > 0 and b.tokens > 0
