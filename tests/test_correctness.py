"""Differential oracle tests (SURVEY §5 plan #1): every query with a
declared oracle must match DuckDB on the sf0.01 testdata — the same
check the driver runs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.plans import all_oracles, all_queries

from .conftest import SF_CORRECTNESS
from .oracle import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    ok, msg = compare(spark, SF_CORRECTNESS, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_registry_is_exactly_50(spark):
    """The driver records only the first 50 queries() entries; a 51st
    silently drops off the correctness artifact. As of r5 EVERY entry
    carries a DuckDB oracle (fintech_gold_suite gained one via the
    committed silver fixture)."""
    assert len(QUERIES) == 50, sorted(QUERIES)
    assert len(ORACLES) == 50


def test_demoted_correlated_subquery_oracle(spark):
    """op_correlated_subquery left the driver registry in r11
    (Catalyst's decorrelated plan shape is already driver-visible via
    the tpch join-agg rows; swapped for tokenizer_pipeline); its
    oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        CORRELATED_SUBQUERY_SQL,
        correlated_subquery,
    )

    ok, msg = compare(
        spark, SF_CORRECTNESS, correlated_subquery, CORRELATED_SUBQUERY_SQL
    )
    assert ok, msg


def test_demoted_distinct_projection_oracle(spark):
    """op_distinct_projection left the driver registry in r4 (swapped
    for corpus_build_summary); its oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        DISTINCT_PROJECTION_SQL,
        distinct_projection,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, distinct_projection, DISTINCT_PROJECTION_SQL)
    assert ok, msg


def test_demoted_scalar_subquery_oracle(spark):
    """op_scalar_subquery left the driver registry in r5 (subsumed by
    op_correlated_subquery; swapped for corpus_hygiene_suite); its
    oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        SCALAR_SUBQUERY_SQL,
        scalar_subquery,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, scalar_subquery, SCALAR_SUBQUERY_SQL)
    assert ok, msg


def test_demoted_explode_token_counts_oracle(spark):
    """op_explode_token_counts left the driver registry in r5 (explode
    stays driver-visible via dedup_ngram_jaccard's inverted index and
    text_token_stats; swapped for op_sessionization); its oracle
    coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        EXPLODE_TOKEN_COUNTS_SQL,
        explode_token_counts,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, explode_token_counts, EXPLODE_TOKEN_COUNTS_SQL)
    assert ok, msg


def test_demoted_set_ops_oracle(spark):
    """op_set_ops left the driver registry in r6 (UNION/INTERSECT/
    EXCEPT are engine built-ins with no plan risk; swapped for
    similarity_scale_suite); its oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import SET_OPS_SQL, set_ops

    ok, msg = compare(spark, SF_CORRECTNESS, set_ops, SET_OPS_SQL)
    assert ok, msg


def test_demoted_window_rank_oracle(spark):
    """op_window_rank_per_group left the driver registry in r7
    (partitioned ROW_NUMBER stays driver-visible via
    op_window_functions_suite and gold_product_ranking; swapped for
    events_analytics_suite); its oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        WINDOW_RANK_PER_GROUP_SQL,
        window_rank_per_group,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, window_rank_per_group, WINDOW_RANK_PER_GROUP_SQL)
    assert ok, msg


def test_demoted_sketch_rollup_oracle(spark):
    """The full four-family sketch-rollup row (HLL-union booleans +
    Misra-Gries + Count-Min + histogram quantiles) left the driver
    registry in r10 after the r7/r8/r9 driver hash-reds; r12 RESTORED
    it as the driver row once the r11 judge root-caused the reds to
    two uncast HUGEINT oracle columns (mg_top1_lb / mg_bound_total —
    see plans/adhoc.py and tests/test_oracle_portability.py). This
    test now duplicates the driver row's coverage; kept as the local
    regression gate for the full rollup."""
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        APPROX_DISTINCT_SKETCH_ROLLUP_SQL,
        approx_distinct_sketch_rollup,
    )

    ok, msg = compare(
        spark, SF_CORRECTNESS,
        approx_distinct_sketch_rollup, APPROX_DISTINCT_SKETCH_ROLLUP_SQL,
    )
    assert ok, msg


def test_demoted_mm_fake_decode_oracle(spark):
    """The r3-r5 fake-decode multimodal row left the driver registry
    in r6 (the slot now runs the REAL header probe over the committed
    media fixture); the fake path — the no-payload fallback — keeps
    its full sha256-derived value oracle here."""
    from lakehouse_file_format_compare_spark.plans.ext_plans import (
        MM_IMAGE_FEATURES_FAKE_SQL,
        mm_image_features_fake,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, mm_image_features_fake, MM_IMAGE_FEATURES_FAKE_SQL)
    assert ok, msg


def test_tpch_extended_oracles(spark):
    """Q4 (EXISTS semi-join) and Q13 (count-of-counts histogram)
    analogs — pytest-oracled outside the 50-cap registry."""
    from lakehouse_file_format_compare_spark.plans.tpch import (
        EXTENDED_ORACLES,
        EXTENDED_QUERIES,
    )

    for name, fn in EXTENDED_QUERIES.items():
        ok, msg = compare(spark, SF_CORRECTNESS, fn, EXTENDED_ORACLES[name])
        assert ok, (name, msg)


def test_demoted_knn_lsh_recall_oracle(spark):
    """sim_knn_lsh left the driver registry in r12 (its oracle was the
    thinnest in the registry — n_queries + an expected-true recall
    boolean — and the LSH surface stays driver-visible via
    similarity_scale_suite; swapped for the corpus_pipeline
    integration row); its oracle coverage continues here."""
    from lakehouse_file_format_compare_spark.plans.similarity_plans import (
        KNN_RECALL_SQL,
        knn_lsh_recall,
    )

    ok, msg = compare(spark, SF_CORRECTNESS, knn_lsh_recall, KNN_RECALL_SQL)
    assert ok, msg
