"""Naive-Bayes classifier (operators/classify.py): hand-checkable
values on a tiny fixture, an exact DuckDB oracle replaying the full
train+score pipeline on the documents table, empty-input behavior,
and a token-order-permutation property (grid-snapped addends make the
per-doc sums order-invariant)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.functions.numeric import grid_sql
from lakehouse_file_format_compare_spark.operators.classify import (
    nb_score,
    nb_train,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

ALPHA = 1.0
SPAM = " win free prize click now offer deal bonus"


def _g(x: float, dp: int) -> float:
    scale = 10 ** dp
    return math.floor(x * scale + 0.5) / scale


def test_hand_values(spark):
    train = spark.createDataFrame(
        [
            (1, "apple banana", 0),
            (2, "banana cherry", 0),
            (3, "spam spam offer", 1),
        ],
        "doc_id long, text string, label int",
    )
    model = nb_train(train, alpha=ALPHA)
    meta = model.meta.collect()[0]
    # vocab = {apple, banana, cherry, spam, offer} = 5
    assert meta["vocab"] == 5 and meta["train_docs"] == 3
    assert meta["prior0"] == pytest.approx(_g(math.log(2 / 3), 6), abs=1e-9)
    terms = {r["term"]: r for r in model.terms.collect()}
    # class 0: tot0=4 -> ll0(banana) = ln(3)-ln(9); class 1: tot1=3
    assert terms["banana"]["ll0"] == pytest.approx(
        _g(math.log(3) - math.log(9), 6), abs=1e-9
    )
    assert terms["spam"]["ll1"] == pytest.approx(
        _g(math.log(3) - math.log(8), 6), abs=1e-9
    )
    scored = {
        r["doc_id"]: r
        for r in nb_score(
            model,
            spark.createDataFrame(
                [(10, "spam offer"), (11, "apple banana"), (12, "")],
                "doc_id long, text string",
            ),
        ).collect()
    }
    assert scored[10]["predicted"] == 1
    assert scored[11]["predicted"] == 0
    # zero-token doc scores on priors alone: margin = prior1 - prior0 < 0
    assert scored[12]["predicted"] == 0
    assert scored[12]["margin"] == pytest.approx(
        _g(_g(math.log(1 / 3), 6) - _g(math.log(2 / 3), 6), 2), abs=1e-9
    )


def _pipeline_sql(path: str) -> str:
    return f"""
WITH src AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label,
           CASE WHEN doc_id % 3 = 0 THEN text || '{SPAM}' ELSE text END AS text
    FROM read_parquet('{path}')
), toked AS (
    SELECT doc_id, label,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> length(x) > 0) AS t
    FROM src
), tr AS (SELECT * FROM toked WHERE doc_id % 4 != 0),
   te AS (SELECT * FROM toked WHERE doc_id % 4 = 0),
   occ AS (SELECT label, unnest(t) AS term FROM tr),
   cnt AS (
    SELECT term,
           SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0,
           SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1
    FROM occ GROUP BY term
), tot AS (
    SELECT COALESCE(SUM(c0), 0) AS tot0, COALESCE(SUM(c1), 0) AS tot1,
           COUNT(*) AS v
    FROM cnt
), nd AS (
    SELECT SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nd0,
           SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS nd1,
           COUNT(*) AS n
    FROM tr
), meta AS (
    SELECT {grid_sql("ln(CAST(nd0 AS DOUBLE)) - ln(CAST(n AS DOUBLE))", 6)} AS prior0,
           {grid_sql("ln(CAST(nd1 AS DOUBLE)) - ln(CAST(n AS DOUBLE))", 6)} AS prior1,
           {grid_sql(f"ln({ALPHA}) - ln(tot0 + {ALPHA} * v)", 6)} AS fb0,
           {grid_sql(f"ln({ALPHA}) - ln(tot1 + {ALPHA} * v)", 6)} AS fb1
    FROM tot, nd
), ll AS (
    SELECT term,
           {grid_sql(f"ln(c0 + {ALPHA}) - ln(tot0 + {ALPHA} * v)", 6)} AS ll0,
           {grid_sql(f"ln(c1 + {ALPHA}) - ln(tot1 + {ALPHA} * v)", 6)} AS ll1
    FROM cnt, tot
), teocc AS (SELECT doc_id, unnest(t) AS term FROM te),
   sums AS (
    SELECT o.doc_id,
           SUM(COALESCE(ll0, fb0)) AS s0, SUM(COALESCE(ll1, fb1)) AS s1
    FROM teocc o LEFT JOIN ll USING (term) CROSS JOIN meta
    GROUP BY o.doc_id
)
SELECT t.doc_id,
       {grid_sql("COALESCE(s0, 0) + prior0", 2)} AS score0,
       {grid_sql("COALESCE(s1, 0) + prior1", 2)} AS score1,
       {grid_sql("(COALESCE(s1, 0) + prior1) - (COALESCE(s0, 0) + prior0)", 2)} AS margin,
       CASE WHEN {grid_sql("(COALESCE(s1, 0) + prior1) - (COALESCE(s0, 0) + prior0)", 2)} > 0
            THEN 1 ELSE 0 END AS predicted
FROM te t LEFT JOIN sums USING (doc_id) CROSS JOIN meta
ORDER BY doc_id
"""


def _spam_split(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    src = docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id"), F.lit(3)) == 0).cast("int").alias("label"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.concat(F.col("text"), F.lit(SPAM)),
        ).otherwise(F.col("text")).alias("text"),
    )
    train = src.where(F.pmod(F.col("doc_id"), F.lit(4)) != 0)
    test = src.where(F.pmod(F.col("doc_id"), F.lit(4)) == 0)
    return train, test


def test_oracle_on_documents(spark):
    path = os.path.join(SF_CORRECTNESS, "documents.parquet")
    train, test = _spam_split(spark)
    model = nb_train(train, alpha=ALPHA)
    got = sorted(map(tuple, nb_score(model, test).collect()))
    assert len(got) > 0
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(_pipeline_sql(path)).fetchall()))
    con.close()
    assert len(got) == len(want)
    preds_g, preds_w = 0, 0
    for (gd, g0, g1, gm, gp), (wd, w0, w1, wm, wp) in zip(got, want):
        assert (gd, gp) == (wd, wp)
        assert g0 == pytest.approx(w0, abs=2e-2)
        assert gm == pytest.approx(wm, abs=2e-2)
        preds_g += gp
        preds_w += wp
    # the injected spam signal is decisive: every held-out label-1 doc
    # is recovered (doc_id % 12 == 0 within the % 4 == 0 split)
    labels = {
        r["doc_id"]: r["label"] for r in test.select("doc_id", "label").collect()
    }
    correct = sum(1 for (gd, _, _, _, gp) in got if gp == labels[gd])
    assert correct == len(got)  # linearly separable by construction
    assert preds_g == sum(labels.values())


def test_score_empty_test_set(spark):
    train, _ = _spam_split(spark)
    model = nb_train(train, alpha=ALPHA)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert nb_score(model, empty).count() == 0


def test_prediction_invariant_to_token_order(spark):
    """Grid-snapped addends: permuting a test doc's tokens can't move
    its score by more than summation ulp noise << half a grid step."""
    train, test = _spam_split(spark)
    model = nb_train(train, alpha=ALPHA)
    base = {r["doc_id"]: r for r in nb_score(model, test).collect()}
    reversed_text = test.select(
        "doc_id",
        F.array_join(
            F.reverse(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: F.length(t) > 0,
                )
            ),
            " ",
        ).alias("text"),
    )
    for r in nb_score(model, reversed_text).collect():
        b = base[r["doc_id"]]
        assert r["predicted"] == b["predicted"]
        assert r["margin"] == pytest.approx(b["margin"], abs=2e-2)


def test_alpha_must_be_positive(spark):
    train, _ = _spam_split(spark)
    with pytest.raises(ValueError):
        nb_train(train, alpha=0.0)
