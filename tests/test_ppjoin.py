"""PPJoin prefix-filtered exact Jaccard join
(operators/dedup.py::ppjoin_jaccard_pairs, r10): output equality with
the naive inverted-index join at multiple thresholds, the
candidate-volume contract that justifies it, degenerate inputs, and
the no-Cartesian plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    _shingle_pairs,
    ngram_jaccard_pairs,
    ppjoin_jaccard_pairs,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS, SF_SMOKE


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_ppjoin_equals_naive_at_multiple_thresholds(spark):
    docs = table(spark, SF_SMOKE, "documents")
    for t in (0.3, 0.5, 0.8, 1.0):
        naive = _pairs(ngram_jaccard_pairs(docs, threshold=t))
        pp = _pairs(ppjoin_jaccard_pairs(docs, threshold=t))
        assert pp == naive, t
    assert len(_pairs(ppjoin_jaccard_pairs(docs, threshold=0.3))) > 0


def test_ppjoin_candidate_volume_bounded(spark):
    """The point of prefix filtering: candidate pairs (distinct pairs
    sharing a PREFIX shingle + passing the length filter) must be a
    strict subset of the naive join's pair universe (distinct pairs
    sharing ANY shingle), and materially smaller on the real corpus."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    sh = _shingle_pairs(docs, "doc_id", "text", 3)
    a, b = sh.alias("a"), sh.alias("b")
    naive_pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc"), F.col("b.doc")).distinct().count()
    )
    # re-derive the candidate set exactly as the operator builds it
    from lakehouse_file_format_compare_spark.operators import dedup as D

    t = 0.5
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__cnt"))
    ordered = (
        sh.join(counts, "shingle")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("__cnt").alias("c"),
            F.xxhash64("shingle").alias("h"),
            F.col("shingle").alias("s"),
        ))).alias("__arr"))
        .select("doc",
                F.transform(F.col("__arr"), lambda x: x["s"]).alias("shs"),
                F.size("__arr").alias("sz"))
    )
    plen = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")).cast("int") + 1
    prefixes = ordered.select(
        "doc", "sz", F.explode(F.slice(F.col("shs"), 1, plen)).alias("shingle")
    )
    pa, pb = prefixes.alias("pa"), prefixes.alias("pb")
    cand = (
        pa.join(pb, (F.col("pa.shingle") == F.col("pb.shingle"))
                & (F.col("pa.doc") < F.col("pb.doc"))
                & (F.least(F.col("pa.sz"), F.col("pb.sz")).cast("double")
                   >= F.lit(t) * F.greatest(F.col("pa.sz"), F.col("pb.sz"))))
        .select(F.col("pa.doc"), F.col("pb.doc")).distinct().count()
    )
    true_pairs = ngram_jaccard_pairs(docs, threshold=t).count()
    assert cand <= naive_pairs
    assert cand < naive_pairs / 2  # material reduction on this corpus
    assert cand >= true_pairs  # no true pair filtered (exactness)


def test_ppjoin_degenerate_inputs(spark):
    rows = [
        (0, ""), (1, "   "), (2, "one"), (3, "one"),
        (4, "a b c d"), (5, "a b c d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pp = _pairs(ppjoin_jaccard_pairs(docs, threshold=0.5))
    naive = _pairs(ngram_jaccard_pairs(docs, threshold=0.5))
    assert pp == naive
    assert (2, 3, 1.0) in pp  # single-shingle docs pair up
    assert (4, 5, 1.0) in pp
    import pytest

    with pytest.raises(ValueError):
        ppjoin_jaccard_pairs(docs, threshold=0.0)


def test_ppjoin_plan_is_jvm_no_cartesian(spark):
    docs = table(spark, SF_SMOKE, "documents")
    plan = (
        ppjoin_jaccard_pairs(docs, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
