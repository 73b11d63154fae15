"""Exact cross-document substring duplication (r6 verdict #2 —
operators/dedup.py::substring_duplicates, the Lee et al. 2022
suffix-array dedup mode re-shaped as anchor-gram buckets + diagonal
run extension).

Three independent verifications:
- a full DuckDB oracle that joins the literal gram STRINGS (the Spark
  side joins 128-bit anchor hashes, so bit-for-bit agreement also
  proves no hash collision occurred on the test data);
- a from-scratch O(|A|·|B|) Python diagonal-scan reference on sampled
  pairs (independent of the shared runs-on-diagonals idea's SQL/Spark
  encodings) proving spans are exactly the maximal ones;
- structural contracts: every injected pair found, no span below the
  minimum, boilerplate cap semantics, empty input.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import substring_duplicates
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS
from .oracle import duck_connection

L = 12  # anchor/minimum span width used throughout (docs avg ~54 tokens)

# injection: groups of two consecutive doc_ids share a 13-token span
# (6 fixed + 1 group token + 6 fixed); fixed runs are < L tokens so
# docs from DIFFERENT groups can never match >= L tokens through the
# injection alone (the group token breaks every window crossing it)
_PREFIX = " sdx aa bb cc dd ee g"
_SUFFIX = " ff gg hh ii jj kk"


def _injected(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(_PREFIX),
            F.floor(F.col("doc_id") / 2).cast("long").cast("string"),
            F.lit(_SUFFIX),
        ).alias("text"),
    )


_ORACLE_SQL = f"""
WITH sd AS (
    SELECT doc_id,
           text || ' sdx aa bb cc dd ee g' || CAST(doc_id // 2 AS VARCHAR)
                || ' ff gg hh ii jj kk' AS text
    FROM documents
), toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM sd
), gr AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{L - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {L} + 2)) AS i
          FROM toks WHERE len(t) >= {L})
), m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
    FROM gr a JOIN gr b USING (g)
    WHERE a.doc_id < b.doc_id
), runs AS (
    SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
           pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                      ORDER BY pos_a) AS grp
    FROM m
)
SELECT doc_a, doc_b, MIN(pos_a) AS a_start, MIN(pos_b) AS b_start,
       COUNT(*) + {L - 1} AS span_tokens
FROM runs GROUP BY doc_a, doc_b, diag, grp
"""


def _spark_spans(spark, sf_dir, **kw):
    return sorted(
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["span_tokens"])
        for r in substring_duplicates(
            _injected(spark, sf_dir), min_span_tokens=L, **kw
        ).collect()
    )


def test_substring_spans_match_duckdb_string_join_oracle(spark):
    got = _spark_spans(spark, SF_CORRECTNESS)
    con = duck_connection(SF_CORRECTNESS)
    want = sorted(
        tuple(int(v) for v in row) for row in con.execute(_ORACLE_SQL).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) >= 200  # non-vacuous: injected pairs + natural overlaps


def _py_maximal_spans(ta: list[str], tb: list[str], min_span: int):
    """Independent O(|A|·|B|) reference: scan every diagonal for
    maximal equal-token runs >= min_span."""
    out = []
    for d in range(-(len(tb) - 1), len(ta)):
        i = max(0, d)
        j = i - d
        run = 0
        while i <= len(ta) and j <= len(tb):
            if i < len(ta) and j < len(tb) and ta[i] == tb[j]:
                run += 1
            else:
                if run >= min_span:
                    out.append((i - run + 1, j - run + 1, run))  # 1-based
                run = 0
            i += 1
            j += 1
    return sorted(out)


def test_spans_are_exactly_the_maximal_runs(spark):
    """Python diagonal-scan reference on the five lowest-id injected
    pairs: the operator's spans for each pair must equal the reference
    set exactly (finds them all, extends them fully, splits gaps)."""
    rows = {
        r["doc_id"]: r["text"]
        for r in _injected(spark, SF_CORRECTNESS).where(F.col("doc_id") < 10).collect()
    }

    def toks(s):
        return [t for t in re.split(r"\s+", s.strip().lower()) if t]

    spans = [s for s in _spark_spans(spark, SF_CORRECTNESS) if s[1] < 10]
    for a in range(0, 10):
        for b in range(a + 1, 10):
            got = sorted((s[2], s[3], s[4]) for s in spans if s[0] == a and s[1] == b)
            want = _py_maximal_spans(toks(rows[a]), toks(rows[b]), L)
            assert got == want, (a, b, got, want)


def test_every_injected_pair_found_with_full_span(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    n = docs.count()
    spans = _spark_spans(spark, SF_CORRECTNESS)
    by_pair = {}
    for da, db, _, _, st in spans:
        by_pair[(da, db)] = max(by_pair.get((da, db), 0), st)
    for g in range(n // 2):
        a, b = 2 * g, 2 * g + 1
        assert by_pair.get((a, b), 0) >= 13, (a, b)  # the 13-token injection
    assert all(st >= L for *_, st in spans)


def test_boilerplate_cap_drops_hot_anchors(spark):
    """max_gram_docs=1 kills every cross-document anchor (any shared
    gram sits in >= 2 docs) -> no spans at all; a loose cap changes
    nothing on this corpus (max natural anchor spread is small)."""
    assert _spark_spans(spark, SF_CORRECTNESS, max_gram_docs=1) == []
    assert _spark_spans(spark, SF_CORRECTNESS, max_gram_docs=10_000) == _spark_spans(
        spark, SF_CORRECTNESS
    )


def test_empty_and_short_inputs(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    empty = docs.where(F.lit(False))
    assert substring_duplicates(empty, min_span_tokens=L).count() == 0
    # docs shorter than the window contribute no anchors, no crash
    short = docs.select("doc_id", F.lit("one two three").alias("text"))
    assert substring_duplicates(short, min_span_tokens=L).count() == 0


def test_plan_is_bucket_join_no_cartesian(spark):
    df = substring_duplicates(_injected(spark, SF_CORRECTNESS), min_span_tokens=L)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


_REMOVAL_ORACLE_SQL = f"""
WITH sd AS (
    SELECT doc_id,
           text || ' sdx aa bb cc dd ee g' || CAST(doc_id // 2 AS VARCHAR)
                || ' ff gg hh ii jj kk' AS text
    FROM documents
), lt AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM sd
), gr AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{L - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {L} + 2)) AS i
          FROM lt WHERE len(t) >= {L})
), m AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
    FROM gr a JOIN gr b USING (g)
    WHERE a.doc_id < b.doc_id
), runs AS (
    SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
           pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                      ORDER BY pos_a) AS grp
    FROM m
), spans AS (
    SELECT doc_b, MIN(pos_b) AS b_start, COUNT(*) + {L - 1} AS span_tokens
    FROM runs GROUP BY doc_a, doc_b, diag, grp
), iv AS (
    SELECT doc_b AS doc, b_start AS lo, b_start + span_tokens AS hi FROM spans
), ot AS (
    -- ORIGINAL casing: whitespace tokenization gives identical
    -- positions to the lowercased detection stream
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM sd
), pos AS (
    SELECT doc_id, p, t[p] AS tok
    FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS p FROM ot)
), keep AS (
    SELECT doc_id, p, tok FROM pos
    WHERE NOT EXISTS (SELECT 1 FROM iv
                      WHERE iv.doc = pos.doc_id AND pos.p >= iv.lo AND pos.p < iv.hi)
), rebuilt AS (
    SELECT doc_id, array_to_string(list(tok ORDER BY p), ' ') AS text
    FROM keep GROUP BY doc_id
)
SELECT s.doc_id, COALESCE(r.text, '') AS text
FROM sd s LEFT JOIN rebuilt r USING (doc_id)
"""


def test_remove_duplicate_spans_matches_duckdb_oracle(spark):
    from lakehouse_file_format_compare_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    sd = _injected(spark, SF_CORRECTNESS)
    spans = substring_duplicates(sd, min_span_tokens=L)
    got = sorted(
        (r["doc_id"], r["text"])
        for r in remove_duplicate_spans(sd, spans).collect()
    )
    con = duck_connection(SF_CORRECTNESS)
    want = sorted((int(d), t) for d, t in con.execute(_REMOVAL_ORACLE_SQL).fetchall())
    con.close()
    assert got == want


def test_remove_duplicate_spans_resolves_every_pair(spark):
    """After the repair, re-detection finds NONE of the previously
    detected pairs (each pair's b-side lost the shared span), while
    canonical (a-side) copies survive; docs never named as doc_b keep
    their token stream verbatim (modulo whitespace normalization)."""
    from lakehouse_file_format_compare_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    sd = _injected(spark, SF_CORRECTNESS)
    spans = substring_duplicates(sd, min_span_tokens=L).cache()
    old_pairs = {(r["doc_a"], r["doc_b"]) for r in spans.collect()}
    assert old_pairs
    repaired = remove_duplicate_spans(sd, spans).cache()
    new_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in substring_duplicates(repaired, min_span_tokens=L).collect()
    }
    assert not (old_pairs & new_pairs), sorted(old_pairs & new_pairs)[:5]

    repaired_ids = {b for _, b in old_pairs}
    untouched = sorted(
        (r["doc_id"], r["text"].split())
        for r in sd.collect()
        if r["doc_id"] not in repaired_ids
    )
    untouched_after = sorted(
        (r["doc_id"], r["text"].split())
        for r in repaired.collect()
        if r["doc_id"] not in repaired_ids
    )
    assert untouched == untouched_after
    spans.unpersist(); repaired.unpersist()


def test_remove_with_no_spans_is_whitespace_normalized_identity(spark):
    from lakehouse_file_format_compare_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    sd = _injected(spark, SF_CORRECTNESS)
    no_spans = substring_duplicates(sd, min_span_tokens=L).where(F.lit(False))
    out = {r["doc_id"]: r["text"] for r in remove_duplicate_spans(sd, no_spans).collect()}
    for r in sd.collect():
        assert out[r["doc_id"]] == " ".join(r["text"].split())


def test_hypothesis_random_corpora_match_python_reference(spark):
    """Adversarial sweep: tiny alphabets force dense natural overlap —
    periodic runs, overlapping matches, repeated grams inside one doc
    (multiple diagonals), spans touching doc boundaries. The operator
    must equal the O(n·m) Python diagonal reference on every pair, and
    the self-operator must equal the reference applied to (doc, doc)
    restricted to pos_a < pos_b diagonals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lakehouse_file_format_compare_spark.operators.dedup import (
        self_duplicate_spans,
    )

    MINSPAN = 3

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from("ab"), min_size=0, max_size=24).map(
                lambda ts: " ".join(ts)
            ),
            min_size=2,
            max_size=5,
        )
    )
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {}
        for r in substring_duplicates(
            df, min_span_tokens=MINSPAN
        ).collect():
            got.setdefault((r["doc_a"], r["doc_b"]), []).append(
                (r["a_start"], r["b_start"], r["span_tokens"])
            )
        toks = {i: [x for x in t.split() if x] for i, t in rows}
        for a in range(len(rows)):
            for b in range(a + 1, len(rows)):
                want = _py_maximal_spans(toks[a], toks[b], MINSPAN)
                assert sorted(got.get((a, b), [])) == want, (a, b)

        sgot = {}
        for r in self_duplicate_spans(
            df, min_span_tokens=MINSPAN, max_gram_occurrences=None
        ).collect():
            sgot.setdefault(r["doc_id"], []).append(
                (r["a_start"], r["b_start"], r["span_tokens"])
            )
        for i in range(len(rows)):
            ref = [
                (sa, sb, ln)
                for sa, sb, ln in _py_maximal_spans(toks[i], toks[i], MINSPAN)
                if sa < sb
            ]
            assert sorted(sgot.get(i, [])) == sorted(ref), i

    run()
