"""Bloom-filter membership sketch (operators/membership.py):
pure-Python mirror equivalence of the bitmap and probes, the
no-false-negative guarantee under deliberately collision-heavy
parameters, mergeability, the prefiltered-contamination == direct
equality, empty inputs and plan pins."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.membership import (
    WORD_BITS,
    bloom_build,
    bloom_prefiltered_contamination,
    bloom_probe,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def _mirror_bits(keys, n_words, k, tag="bf"):
    m = n_words * WORD_BITS
    words: dict[int, int] = {}
    for key in keys:
        for j in range(k):
            h = int(hashlib.md5(f"{tag}{j}|{key}".encode()).hexdigest()[:12], 16) % m
            words[h // WORD_BITS] = words.get(h // WORD_BITS, 0) | (
                1 << (h % WORD_BITS)
            )
    return words


def _mirror_member(key, words, n_words, k, tag="bf"):
    m = n_words * WORD_BITS
    for j in range(k):
        h = int(hashlib.md5(f"{tag}{j}|{key}".encode()).hexdigest()[:12], 16) % m
        if not (words.get(h // WORD_BITS, 0) >> (h % WORD_BITS)) & 1:
            return 0
    return 1


@given(
    keys=st.lists(st.text(alphabet="abcdef 123", min_size=0, max_size=8),
                  min_size=0, max_size=20, unique=True),
    probes=st.lists(st.text(alphabet="abcdef 123xyz", min_size=0, max_size=8),
                    min_size=1, max_size=10, unique=True),
    n_words=st.sampled_from([1, 2, 8]),
    k=st.integers(min_value=1, max_value=4),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_matches_python_mirror_swept(spark, keys, probes, n_words, k):
    """Tiny n_words forces hard collisions — the bitmap, every probe
    verdict, and the no-false-negative guarantee must still match the
    mirror bit-for-bit."""
    kdf = spark.createDataFrame([(x,) for x in keys], "key string") if keys else (
        spark.createDataFrame([], "key string"))
    bloom = bloom_build(kdf, "key", n_words=n_words, k=k)
    got_bits = {r.word: r.bits for r in bloom.collect()}
    assert got_bits == _mirror_bits(keys, n_words, k)
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    got = {
        r.key: r.bf_member
        for r in bloom_probe(pdf, "key", bloom, n_words=n_words, k=k).collect()
    }
    words = _mirror_bits(keys, n_words, k)
    want = {x: _mirror_member(x, words, n_words, k) for x in probes}
    assert got == want
    for x in probes:
        if x in keys:
            assert got[x] == 1  # no false negatives, ever


def test_merge_is_bit_or_reaggregation(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(30)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(30)], "key string")
    both = a.union(b)
    direct = {r.word: r.bits for r in bloom_build(both, "key", n_words=4).collect()}
    merged = {
        r.word: r.bits
        for r in (
            bloom_build(a, "key", n_words=4)
            .union(bloom_build(b, "key", n_words=4))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .collect()
        )
    }
    assert direct == merged


def test_prefiltered_contamination_equals_direct(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        ngram_contamination,
    )

    docs = table(spark, SF_SMOKE, "documents")
    ev = docs.orderBy("doc_id").limit(25)
    direct = {
        (r.doc_id, r.eval_id, r.shared_ngrams)
        for r in ngram_contamination(docs, ev, n=8).collect()
    }
    pre = {
        (r.doc_id, r.eval_id, r.shared_ngrams)
        for r in bloom_prefiltered_contamination(
            docs, ev, n=8, n_words=256
        ).collect()
    }
    assert direct == pre and len(direct) > 0


def test_empty_inputs(spark):
    empty = spark.createDataFrame([], "key string")
    assert bloom_build(empty, "key").count() == 0
    keys = spark.createDataFrame([("x",), ("y",)], "key string")
    probed = bloom_probe(keys, "key", bloom_build(empty, "key")).collect()
    assert {r.key: r.bf_member for r in probed} == {"x": 0, "y": 0}
    assert bloom_probe(empty, "key", bloom_build(keys, "key")).count() == 0


def test_plan_shape(spark):
    docs = table(spark, SF_SMOKE, "documents")
    keys = docs.select(F.col("text").alias("key")).limit(200)
    bloom = bloom_build(keys, "key")
    probed = bloom_probe(docs.select(F.col("text").alias("key")), "key", bloom)
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the filter is broadcast


def test_bloom_decontaminate_equals_direct(spark):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        decontaminate,
    )
    from lakehouse_file_format_compare_spark.operators.membership import (
        bloom_decontaminate,
    )

    docs = table(spark, SF_SMOKE, "documents")
    ev = docs.orderBy("doc_id").limit(25)
    direct = {r.doc_id for r in decontaminate(docs, ev, n=8).select("doc_id").collect()}
    pre = {
        r.doc_id
        for r in bloom_decontaminate(docs, ev, n=8, n_words=256)
        .select("doc_id")
        .collect()
    }
    assert direct == pre
    assert len(pre) < docs.count()  # something was actually dropped


def test_literal_probe_equals_join_probe(spark):
    """bloom_probe_literal verdicts are bit-equal to the join-form
    probe across collision-heavy parameterizations, and its plan is a
    pure projection — no join, no explode, no exchange."""
    import random
    import string

    from lakehouse_file_format_compare_spark.operators.membership import (
        bloom_literal,
        bloom_probe_literal,
    )

    rng = random.Random(31)
    keys = [
        "".join(rng.choices(string.ascii_lowercase + " ", k=rng.randint(0, 10)))
        for _ in range(60)
    ]
    probes = keys[:20] + [
        "".join(rng.choices(string.ascii_lowercase, k=5)) for _ in range(40)
    ]
    kdf = spark.createDataFrame([(x,) for x in set(keys)], "key string")
    pdf = spark.createDataFrame([(x,) for x in set(probes)], "key string")
    for n_words, k in [(1, 3), (4, 4), (64, 2)]:
        bloom = bloom_build(kdf, "key", n_words=n_words, k=k)
        join_res = {
            r.key: r.bf_member
            for r in bloom_probe(pdf, "key", bloom, n_words=n_words, k=k).collect()
        }
        lit_res = {
            r.key: r.bf_member
            for r in bloom_probe_literal(
                pdf, "key", bloom_literal(bloom, n_words), k=k
            ).collect()
        }
        assert join_res == lit_res, (n_words, k)
    frame = bloom_probe_literal(
        pdf, "key", bloom_literal(bloom_build(kdf, "key", n_words=8), 8)
    )
    plan = frame._sc._jvm.PythonSQLUtils.explainString(
        frame._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Generate" not in plan
