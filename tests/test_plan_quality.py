"""Physical-plan regression tests — the 100 TB design assertions
(SURVEY §4): predicate pushdown reaches the scan, projections prune
the read schema, small dims broadcast, top-k avoids full sorts, and
no core plan falls back to Python row evaluation.
"""

from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.plans import all_queries

from .conftest import SF_CORRECTNESS

QUERIES = all_queries()


def _formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_CORRECTNESS)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    plan = _formatted(spark, "op_filter_project")
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity,45.0)" in plan
    # column pruning: only the 5 needed columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double," in plan


def test_dim_joins_broadcast(spark):
    for name in ["op_dim_join_broadcast", "gold_monthly_balance", "tpch_local_supplier_volume"]:
        plan = _formatted(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name}: dim join is not broadcast"


def test_topk_uses_take_ordered(spark):
    plan = _formatted(spark, "op_topk_orders")
    assert "TakeOrderedAndProject" in plan, "global sort instead of top-k"


def test_left_joins_preserved(spark):
    plan = _formatted(spark, "gold_customer_summary")
    assert "LeftOuter" in plan


def test_no_python_row_udfs_in_core_plans(spark):
    # everything except the multimodal mapInPandas stage must stay JVM-side
    for name in QUERIES:
        if name.startswith("mm_"):
            continue
        plan = _formatted(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-at-a-time Python"


def test_codegen_active(spark):
    # AQE-wrapped plans don't annotate codegen ids before execution;
    # the exchange-free scan plan shows them directly
    plan = _formatted(spark, "op_filter_project")
    assert "codegen id" in plan, "whole-stage codegen not active on the scan pipeline"
    assert spark.conf.get("spark.sql.codegen.wholeStage") == "true"


def test_partial_aggregation_before_shuffle(spark):
    # hash agg must be partial+final (map-side combine), not single-phase
    plan = _formatted(spark, "tpch_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_window_is_partitioned_and_group_limited(spark):
    # op_window_rank_per_group left the 50-cap registry in r7 (swapped
    # for events_analytics_suite); the plan pin drives the demoted
    # function directly
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        window_rank_per_group,
    )

    df = window_rank_per_group(spark, SF_CORRECTNESS)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # partition key retained AND the rank<=3 filter pushed down as a
    # group-limit BELOW the shuffle (partial WindowGroupLimit) — the
    # plan shape that keeps per-group top-k scalable
    assert "c_nationkey" in plan, "window lost its partition key"
    assert plan.count("WindowGroupLimit") >= 2, "rank filter not pushed as partial group-limit"


def test_bucketed_join_skips_shuffle(spark):
    from lakehouse_file_format_compare_spark import catalog as C
    from lakehouse_file_format_compare_spark.sources.testdata import table as tt

    from .conftest import SF_SMOKE

    import shutil

    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")
    shutil.rmtree(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:") + "/bkt.db",
                  ignore_errors=True)
    spark.sql("CREATE DATABASE bkt")
    C.save_bucketed_table(tt(spark, SF_SMOKE, "orders"), "bkt.orders_b",
                          ["o_orderkey"], n_buckets=8)
    C.save_bucketed_table(tt(spark, SF_SMOKE, "lineitem"), "bkt.lineitem_b",
                          ["l_orderkey"], n_buckets=8)
    # at smoke scale the planner would broadcast (bucketing "disabled
    # by query planner"); force the sort-merge path to show the
    # shuffle-free bucketed join that matters at fact-fact scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.lineitem_b").join(
            spark.table("bkt.orders_b"),
            spark.table("bkt.lineitem_b")["l_orderkey"] == spark.table("bkt.orders_b")["o_orderkey"],
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles:\n" + plan
        assert "Bucketed: true" in plan
        assert joined.count() == tt(spark, SF_SMOKE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    C.drop_table(spark, "bkt.orders_b")
    C.drop_table(spark, "bkt.lineitem_b")


def test_disk_partition_pruning(spark, tmp_path_factory):
    # value-partitioned write (K6 analog) must partition-prune on read:
    # the scan's partition filters carry the predicate and only one
    # partition directory is listed
    import pyspark.sql.functions as F

    from lakehouse_file_format_compare_spark.sources.testdata import table as tt

    from .conftest import SF_SMOKE

    path = str(tmp_path_factory.mktemp("pruned")) + "/events_by_type"
    tt(spark, SF_SMOKE, "events").write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "purchase" in plan
    got = df.count()
    want = tt(spark, SF_SMOKE, "events").where(F.col("event_type") == "purchase").count()
    assert got == want


def test_mm_real_probe_plan_shape(spark):
    """r6: the real-probe multimodal row must be ONE Arrow-batched
    mapInPandas stage over (media_id, content) with the binary column
    consumed inside it — no payload bytes in the output schema, no
    row-at-a-time Python."""
    plan = _formatted(spark, "mm_image_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    df = QUERIES["mm_image_features"](spark, SF_CORRECTNESS)
    assert "binary" not in [t for _, t in df.dtypes]


def test_salted_sessionize_plan_bounded_shuffles(spark):
    """r6: the two-phase variant pays at most phase-1 (key, slice)
    window + session-level window + the join-back — bounded exchanges,
    all JVM-side."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_salted,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table as tt

    events = tt(spark, SF_CORRECTNESS, "events")
    df = sessionize_salted(events, slice_sec=3600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 5, plan.count("Exchange")


def test_extended_tpch_plan_shapes(spark):
    """r6 analogs keep the plan shapes that survive 100x: Q6's
    predicates all reach the scan; Q8's seven-way join broadcasts
    every dim and never degenerates to a cartesian; Q17's correlated
    average is one fact-grain aggregate re-joined (no per-row
    subquery); Q22's NOT EXISTS compiles to an anti join."""
    from lakehouse_file_format_compare_spark.plans.tpch import (
        forecasting_revenue_change,
        global_sales_opportunity,
        national_market_share,
        small_quantity_revenue,
    )

    def fmt(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    q6 = fmt(forecasting_revenue_change(spark, SF_CORRECTNESS))
    assert "PushedFilters:" in q6 and "l_quantity" in q6.split("PushedFilters:")[1].split("]")[0]

    q8 = fmt(national_market_share(spark, SF_CORRECTNESS))
    assert "BroadcastHashJoin" in q8
    assert "CartesianProduct" not in q8

    q17 = fmt(small_quantity_revenue(spark, SF_CORRECTNESS))
    assert "CartesianProduct" not in q17
    assert q17.count("HashAggregate") >= 4  # partial+final at part grain AND final scalar
    # r7 (r6 verdict #5): the avg-side lineitem scan is semi-joined
    # against the Brand#5 part keys BEFORE the part-grain aggregate —
    # no full-fact shuffle at part grain for a ~1/25th-selective brand
    assert "LeftSemi" in q17

    q22 = fmt(global_sales_opportunity(spark, SF_CORRECTNESS))
    assert "LeftAnti" in q22


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """The 100 TB shuffle-join lever broadcast can't cover: when the
    filtered build side is too big to broadcast, Spark injects a
    runtime Bloom filter (bloom_filter_agg on the build side,
    might_contain on the fact scan side) so non-joining fact rows die
    BEFORE the shuffle. On local toy data the size thresholds must be
    lowered to trigger it; at warehouse scale the defaults fire —
    this pin proves the engine config keeps the rewrite available."""
    import pyspark.sql.functions as F

    from lakehouse_file_format_compare_spark.sources.testdata import table as tt

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    li = tt(spark, SF_CORRECTNESS, "lineitem")
    orders = tt(spark, SF_CORRECTNESS, "orders").where(F.col("o_totalprice") > 400000)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        assert "bloom_filter_agg" in plan   # build side sketches the keys
        assert "might_contain" in plan      # fact side filters pre-shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_scan,
        )


def test_stratified_sample_window_group_limit(spark):
    # the rank filter must push a Partial WindowGroupLimit below the
    # shuffle: at scale only n rows per stratum leave the map side
    from lakehouse_file_format_compare_spark.operators.sampling import (
        stratified_sample,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table as tt

    from .conftest import SF_SMOKE

    df = stratified_sample(tt(spark, SF_SMOKE, "documents"), ("lang",), 5, ("doc_id",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan  # Partial + Final


def test_no_python_row_udfs_in_r4_operators(spark):
    """The round-4 operator additions (PII, repetition, BM25,
    decontamination, fuzzy joins) must also stay JVM-side — only the
    similarity pandas_udf matmuls are sanctioned Python."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.functions import pii
    from lakehouse_file_format_compare_spark.functions.repetition import (
        duplicate_line_char_fraction,
        duplicate_line_fraction,
        top_ngram_char_fraction,
    )
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        ngram_contamination,
    )
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs_blocked,
        edit_distance_pairs_passjoin,
    )
    from lakehouse_file_format_compare_spark.operators.ranking import bm25_scores
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    cust = table(spark, SF_CORRECTNESS, "customer").select("c_custkey", "c_name").limit(50)
    frames = [
        docs.select(
            pii.pii_score(F.col("text")).alias("s"),
            pii.redact_pii(F.col("text")).alias("r"),
            duplicate_line_fraction(F.col("text")).alias("dl"),
            duplicate_line_char_fraction(F.col("text")).alias("dc"),
        ),
        top_ngram_char_fraction(docs, n=2),
        bm25_scores(docs, ["data", "the"]),
        ngram_contamination(docs, docs.limit(3), n=5),
        edit_distance_pairs_blocked(cust, cust, "c_custkey", "c_name", "c_custkey", "c_name"),
        edit_distance_pairs_passjoin(cust, cust, "c_custkey", "c_name", "c_custkey", "c_name"),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_no_python_row_udfs_in_r5_operators(spark):
    """Round-5 additions (structured fuzzy join, batch sessionization,
    bigram LM, document chunking) stay JVM-side too."""
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs_structured,
    )
    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents
    from lakehouse_file_format_compare_spark.operators.ranking import bigram_lm_scores
    from lakehouse_file_format_compare_spark.operators.temporal import (
        session_stats,
        sessionize,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    events = table(spark, SF_CORRECTNESS, "events")
    cust = table(spark, SF_CORRECTNESS, "customer").select("c_custkey", "c_name").limit(50)
    frames = [
        edit_distance_pairs_structured(
            cust, cust, "c_custkey", "c_name", "c_custkey", "c_name",
            prefix_re=r"^(customer#0*)",
        ),
        sessionize(events),
        session_stats(events),
        bigram_lm_scores(docs),
        chunk_documents(docs),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_no_python_row_udfs_in_r7_operators(spark):
    """Round-7 additions (substring dedup detect/repair, self spans,
    boilerplate-line removal, HLL rollup contract row, hygiene
    serving path) stay JVM-side."""
    from lakehouse_file_format_compare_spark.operators.dedup import (
        remove_boilerplate_lines,
        remove_duplicate_spans,
        self_duplicate_spans,
        substring_duplicates,
    )
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        approx_distinct,
        approx_distinct_sketch_rollup,
    )
    from lakehouse_file_format_compare_spark.plans.hygiene_plans import (
        corpus_hygiene_serving,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.classify import (
        nb_score,
        nb_train,
    )

    docs = table(spark, SF_CORRECTNESS, "documents")
    spans = substring_duplicates(docs, min_span_tokens=12)
    labeled = docs.select(
        "doc_id", "text", (F.col("doc_id") % 3 == 0).cast("int").alias("label")
    )
    frames = [
        spans,
        self_duplicate_spans(docs, min_span_tokens=12),
        remove_duplicate_spans(docs, spans),
        remove_boilerplate_lines(docs),
        approx_distinct(spark, SF_CORRECTNESS),
        approx_distinct_sketch_rollup(spark, SF_CORRECTNESS),
        corpus_hygiene_serving(spark, SF_CORRECTNESS),
        nb_score(nb_train(labeled), docs),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_no_python_row_udfs_in_r7_continuation_operators(spark):
    """r7 continuation additions (funnel / retention / MAD outliers /
    burst stats, DSIR weights + selection) stay JVM-side with no
    Cartesian shapes; the streaming funnel is the one sanctioned
    applyInPandasWithState surface, tested separately."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.funnel import (
        burst_stats,
        funnel_counts,
        mad_outliers,
        retention_matrix,
    )
    from lakehouse_file_format_compare_spark.operators.importance import (
        importance_resample,
        importance_weights,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    events = table(spark, SF_CORRECTNESS, "events")
    docs = table(spark, SF_CORRECTNESS, "documents")
    target = docs.where(F.col("doc_id") % 20 == 0)
    frames = [
        funnel_counts(events, ["signup", "view", "purchase"], max_span_seconds=86400),
        retention_matrix(events, origin="2024-01-01", period_seconds=604800),
        mad_outliers(events, "event_type", "value"),
        burst_stats(events, window_seconds=3600),
        __import__("lakehouse_file_format_compare_spark.operators.funnel",
                   fromlist=["attribution_all_models"]).attribution_all_models(
            events, touch_types=["view", "click"], conversion_type="purchase",
            lookback_seconds=86400,
        ),
        importance_weights(docs, target),
        importance_resample(docs, target, 10),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_hygiene_rows_share_one_documents_scan(spark):
    """r8 (r7 verdict #5): the hygiene suite's ~12 crossJoined metric
    families must read the corpus from ONE shared persisted
    materialization, not re-scan the parquet per family — at 100 TB
    each extra pass is a full-corpus IO bill. Pin: the families read
    via InMemoryTableScan, with at most a handful of scan DEFINITIONS
    in the plan.

    Bound is <=3, not ==1: each occurrence in a formatted plan is an
    InMemoryRelation DEFINITION (materialized once), and Spark's
    CacheManager may substitute cached frames registered by earlier
    operators (e.g. a cached anchor-gram frame) whose definitions
    embed their own scan — the invariant that matters is 'a few
    one-time materializations, never a per-family re-scan' (~12
    parquet re-scans before r8). The check runs against a CLEAN
    cache state (clearCache first): under a full-suite session the
    CacheManager substitutes every registered docs-derived frame it
    can match, each bringing its own scan definition — unbounded by
    anything THIS plan does. Cleared entries rebuild on demand, so
    later tests are unaffected beyond a rebuild."""
    from lakehouse_file_format_compare_spark.plans.hygiene_plans import (
        corpus_hygiene_serving,
        corpus_hygiene_suite,
        uncache_shared_docs,
    )

    uncache_shared_docs()
    spark.catalog.clearCache()
    try:
        for build in (corpus_hygiene_serving, corpus_hygiene_suite):
            df = build(spark, SF_CORRECTNESS)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            assert plan.count("documents.parquet") <= 3, build.__name__
            assert "InMemoryTableScan" in plan, build.__name__
    finally:
        uncache_shared_docs()


def test_no_python_row_udfs_in_r9_operators(spark):
    """r9 additions (profiling, tokenizer-training stats, divergence/
    PSI/drift, incremental dedup) stay JVM-side with no Cartesian
    shapes (the only sanctioned Python surface this round is the
    streaming heavy-hitters drain, applyInPandasWithState — tested in
    test_streaming_topk.py)."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.dedup import (
        full_minhash_est_dedup,
        incremental_minhash_dedup,
        minhash_signatures,
    )
    from lakehouse_file_format_compare_spark.operators.divergence import (
        psi_report,
        token_divergence_report,
        windowed_psi_vs_baseline,
    )
    from lakehouse_file_format_compare_spark.operators.profiling import (
        key_skew_report,
        profile_table,
    )
    from lakehouse_file_format_compare_spark.operators.vocab import (
        bpe_merge_candidates,
        word_vocabulary,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    events = table(spark, SF_CORRECTNESS, "events")
    orders = table(spark, SF_CORRECTNESS, "orders")
    b1 = docs.where(F.col("doc_id") < 250)
    b2 = docs.where(F.col("doc_id") >= 250)
    kept2, _ = incremental_minhash_dedup(b2, minhash_signatures(b1))
    frames = [
        profile_table(orders),
        key_skew_report(orders, ["o_custkey"]),
        word_vocabulary(docs, top_v=25),
        bpe_merge_candidates(docs, top_k=25),
        token_divergence_report(docs, "source"),
        psi_report(docs, "source", "n_chars"),
        windowed_psi_vs_baseline(events, events),
        kept2,
        full_minhash_est_dedup(docs),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_no_python_row_udfs_in_r10_operators(spark):
    """r10 additions stay JVM-side with no Cartesian shapes. The
    incremental EMBEDDING paths are deliberately absent: their single
    Arrow signature matmul per batch IS the sanctioned vectorized
    surface, and its exactly-once evaluation is pinned separately
    (tests/test_incremental_embedding.py::test_batch_is_signed_exactly_once)."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.clustering import (
        assign_clusters,
        snap_vectors,
    )
    from lakehouse_file_format_compare_spark.operators.components import (
        kcore,
        label_propagation,
        triangle_stats,
    )
    from lakehouse_file_format_compare_spark.operators.dedup import (
        ppjoin_jaccard_pairs,
    )
    from lakehouse_file_format_compare_spark.operators.lm import (
        perplexity_report,
    )
    from lakehouse_file_format_compare_spark.operators.sampling import (
        leakage_safe_splits,
    )
    from lakehouse_file_format_compare_spark.operators.vocab import (
        bpe_apply,
        bpe_token_usage,
        unigram_apply,
        unigram_piece_stats,
        word_bpe_tokens,
        wordpiece_apply,
    )
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        BPE_APPLY_MERGES,
        tokenizer_stats,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    pairs = docs.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 7).alias("doc_b")
    )
    frames = [
        bpe_apply(docs, BPE_APPLY_MERGES),
        bpe_token_usage(docs, BPE_APPLY_MERGES, top_k=20),
        word_bpe_tokens(docs.select(F.col("text").alias("word")).limit(5),
                        BPE_APPLY_MERGES),
        tokenizer_stats(spark, SF_CORRECTNESS),
        leakage_safe_splits(docs, pairs, {"train": 0.8, "test": 0.2}),
        perplexity_report(docs, F.col("lang") == "en"),
        assign_clusters(
            snap_vectors(table(spark, SF_CORRECTNESS, "embeddings")),
            {0: [0] * 64, 1: [1000] * 64},
        ),
        triangle_stats(pairs),
        label_propagation(pairs, iterations=2),
        kcore(pairs, iterations=2),
        unigram_apply(docs, {"th": 10**9, "a": 2 * 10**9}),
        unigram_piece_stats(docs, top_k=10),
        wordpiece_apply(docs, {"th": 10**9, "a": 2 * 10**9}),
        ppjoin_jaccard_pairs(docs.limit(100), threshold=0.5),
    ]
    from lakehouse_file_format_compare_spark.operators.winnow import (
        winnow_fingerprints,
        winnow_scalars,
        winnow_shared_pairs,
    )

    frames += [
        winnow_fingerprints(docs),
        winnow_shared_pairs(winnow_fingerprints(docs)),
        winnow_scalars(docs),
    ]
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        auc_report,
        confusion_report,
    )

    eval_in = docs.select(
        (F.col("doc_id") % 37).cast("long").alias("score"),
        (F.col("doc_id") % 2).cast("int").alias("label"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("predicted"),
    )
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        best_threshold_report,
    )

    frames += [
        auc_report(eval_in),
        confusion_report(eval_in),
        best_threshold_report(eval_in),
    ]
    from lakehouse_file_format_compare_spark.operators.membership import (
        bloom_build,
        bloom_prefiltered_contamination,
        bloom_probe,
    )

    keys = docs.select(F.col("text").alias("key"))
    frames += [
        bloom_probe(keys, "key", bloom_build(keys.limit(100), "key")),
        bloom_prefiltered_contamination(
            docs, docs.orderBy("doc_id").limit(10), n=8
        ),
    ]
    # r11 additions: trigram stupid backoff + the tokenizer pipeline's
    # seed-vocab scalars stay JVM-side too
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_report,
    )

    frames += [stupid_backoff_report(docs, F.col("lang") == "en")]
    from lakehouse_file_format_compare_spark.operators.evaluation import (
        calibration_report,
    )
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample_topk,
    )

    frames += [
        calibration_report(eval_in),
        weighted_sample_topk(
            docs.withColumn("w", (F.col("doc_id") % 7 + 1).cast("double")),
            "w", 10, ("doc_id",),
        ),
    ]
    for df in frames:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
