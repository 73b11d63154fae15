"""Run the order/partitioning-invariance contracts at a given
parallelism level and print ONE JSON line with the results.

Why a subprocess script: a JVM cannot change ``master`` on a live
SparkContext, so the only honest way to test a contract at local[2]
AND local[32] is a fresh process per level. The r7 lesson motivating
this tier: the ``hll_rollup_order_invariant`` equality pin passed at
the test suite's local[8] and failed at the driver's local[32]
(DataSketches register state depends on per-partition insertion
order) — an invariance claim verified at ONE parallelism level is
not verified.

Contracts probed (all sf0.01 / sf0.001 — seconds, not minutes):
- the full ``approx_distinct_sketch_rollup`` row (the widened
  four-family frame, demoted from the driver registry in r10 but
  still the sweep's subject): HLL envelope booleans,
  Misra-Gries merged top-k exact integers, Count-Min point estimate,
  histogram quantile bins + fingerprints, all row-conservation checks
- DSIR importance weights (grid-snapped, repartition-invariant)

Usage: python scripts/parallelism_probe.py <master> <shuffle_parts> [conf_json]
  conf_json (optional): a JSON object of extra Spark confs — the r9
  extension sweeps the two knobs that change PARTIAL-aggregation
  layout at a fixed core count (`spark.sql.files.maxPartitionBytes`,
  `spark.default.parallelism`), because the r8 driver red was a
  layout the master-string sweep alone never produced.
Prints: {"master": ..., "approx_distinct": [...], "dsir": [...]}
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    master = sys.argv[1]
    shuffle = int(sys.argv[2])
    extra_conf = json.loads(sys.argv[3]) if len(sys.argv) > 3 else None

    from lakehouse_file_format_compare_spark.session import build_session
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        approx_distinct_sketch_rollup as approx_distinct,
    )
    from lakehouse_file_format_compare_spark.operators.importance import (
        importance_weights,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    spark = build_session(
        app_name=f"parallelism-probe-{master}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf=extra_conf,
    )
    try:
        ad = [
            r.asDict()
            for r in sorted(
                approx_distinct(spark, "/root/testdata/sf0.01").collect(),
                key=lambda r: r["o_orderstatus"],
            )
        ]

        from pyspark.sql import functions as F

        docs = table(spark, "/root/testdata/sf0.001", "documents")
        target = docs.where(F.col("doc_id") % 10 == 0)
        dsir = sorted(
            [r["doc_id"], r["n_tokens"], r["weight"]]
            for r in importance_weights(docs, target).collect()
        )

        # fixed-point PageRank (r8): integer ranks must be IDENTICAL
        # at every parallelism level, not merely within an envelope
        from lakehouse_file_format_compare_spark.operators.pagerank import (
            pagerank,
        )
        from lakehouse_file_format_compare_spark.plans.corpus_plans import (
            _pr_edges,
        )

        pr = sorted(
            [r["node"], r["rank"]]
            for r in pagerank(_pr_edges(docs), iterations=4).collect()
        )

        # r10: the incremental-embedding fold's kept set and the BPE
        # trained merge list + apply fingerprint — all deterministic
        # integer/set outputs (per-vector signatures, grid-6 cosine,
        # tie-broken argmax), so parallelism must not move them
        from lakehouse_file_format_compare_spark.operators.dedup import (
            embedding_signature_store,
            incremental_embedding_dedup,
        )

        emb = table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        donors = emb.select(
            (F.col("vec_id") + 250).alias("vec_id"),
            F.col("embedding").alias("__d"),
        )
        planted = emb.join(donors, "vec_id", "left").select(
            "vec_id",
            F.when(
                (F.col("vec_id") >= 250) & (F.pmod("vec_id", F.lit(5)) == 1)
                & F.col("__d").isNotNull(), F.col("__d"),
            ).otherwise(F.col("embedding")).alias("embedding"),
        )
        kept2, _ = incremental_embedding_dedup(
            planted.where(F.col("vec_id") >= 250),
            embedding_signature_store(planted.where(F.col("vec_id") < 250)),
            threshold=0.95,
        )
        einc = sorted(r["vec_id"] for r in kept2.select("vec_id").collect())

        from lakehouse_file_format_compare_spark.operators.vocab import (
            bpe_apply,
            bpe_train,
        )

        merges = bpe_train(docs, n_merges=4)
        bpe_fp = bpe_apply(docs, merges).agg(
            F.sum(F.col("doc_id") * F.col("n_bpe_tokens")).cast("long")
        ).collect()[0][0]

        # r10 late-round: LM perplexity report, k-means facts and the
        # Zipf fit are exact LONG fingerprints — identical at every
        # parallelism level by construction; sweep them
        from lakehouse_file_format_compare_spark.operators.clustering import (
            kmeans_report,
        )
        from lakehouse_file_format_compare_spark.operators.lm import (
            perplexity_report,
        )
        from lakehouse_file_format_compare_spark.operators.vocab import (
            zipf_fit,
        )

        lm = perplexity_report(docs, F.col("lang") == "en").collect()[0]
        km = kmeans_report(
            table(spark, "/root/testdata/sf0.001", "embeddings"),
            k=4, iters=2,
        ).collect()[0]
        zf = zipf_fit(docs).collect()[0]

        # r10 late-round: graph family (HITS / LPA / triangles) —
        # exact integers over the citation + near-dup graphs
        from lakehouse_file_format_compare_spark.operators.components import (
            kcore,
            label_propagation,
            triangle_stats,
        )
        from lakehouse_file_format_compare_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from lakehouse_file_format_compare_spark.operators.pagerank import (
            hits,
        )

        ht = sorted(
            [r["node"], r["authority"], r["hub"]]
            for r in hits(_pr_edges(docs), iterations=3).collect()
        )
        pairs = ngram_jaccard_pairs(docs, threshold=0.5).select(
            "doc_a", "doc_b"
        ).localCheckpoint()
        lpa = sorted(
            [r["node"], r["community"]]
            for r in label_propagation(pairs, iterations=3).collect()
        )
        tri = triangle_stats(pairs).collect()[0]
        kc = sorted(
            [r["node"], r["core"]]
            for r in kcore(pairs, iterations=3).collect()
        )

        # r10 late-round: unigram-LM Viterbi tokenizer — the encoded
        # LONG DP must be identical at every layout
        from lakehouse_file_format_compare_spark.operators.vocab import (
            unigram_apply,
        )
        from lakehouse_file_format_compare_spark.plans.text_plans import (
            UV_LONGWORD_NANOS,
            UV_OOV_NANOS,
            UV_VOCAB,
        )

        uv = sorted(
            [r["doc_id"], r["n_uv_tokens"], r["uv_cost_nanos"]]
            for r in unigram_apply(
                docs, UV_VOCAB, UV_OOV_NANOS, UV_LONGWORD_NANOS
            ).collect()
        )

        # r10 continuation: winnowing scalars — exact integers over a
        # per-doc window; layout cannot move them
        from lakehouse_file_format_compare_spark.operators.winnow import (
            winnow_scalars,
        )

        wf = winnow_scalars(docs).collect()[0]

        # r10 continuation: exact Mann-Whitney AUC of the LM filter —
        # grouped integer math, layout-proof by construction
        from lakehouse_file_format_compare_spark.plans.text_plans import (
            _lm_auc_scalars,
        )

        lmauc = _lm_auc_scalars(docs).collect()[0]

        # r10 continuation: richness (Chao1/Gini), exact order
        # statistics and greedy coverage picks — all exact integers
        from lakehouse_file_format_compare_spark.operators.importance import (
            greedy_coverage_selection,
        )
        from lakehouse_file_format_compare_spark.operators.profiling import (
            exact_quantiles,
        )
        from lakehouse_file_format_compare_spark.operators.vocab import (
            richness_report,
        )

        rich = richness_report(docs).collect()[0]

        # r11: end-to-end tokenizer pipeline rows (trained BPE merges
        # + seed-derived unigram/WordPiece budgets), the trigram
        # stupid-backoff report, and the A-ES weighted-sample winners
        # — all deterministic integer/argmax outputs; layout must not
        # move any of them (lmauc below already carries the lmcal_*
        # isotonic-calibration scalars after the r11 widening)
        from lakehouse_file_format_compare_spark.operators.lm import (
            stupid_backoff_report,
        )
        from lakehouse_file_format_compare_spark.operators.sampling import (
            weighted_sample_topk,
        )
        from lakehouse_file_format_compare_spark.plans.text_plans import (
            tokenizer_pipeline,
        )

        tp = sorted(
            [list(r) for r in tokenizer_pipeline(
                spark, "/root/testdata/sf0.001"
            ).collect()]
        )
        sb = stupid_backoff_report(docs, F.col("lang") == "en").collect()[0]
        wsamp = sorted(
            [r["doc_id"], r["ws_rank"]]
            for r in weighted_sample_topk(
                docs.withColumn(
                    "w", (F.pmod("doc_id", F.lit(7)) + 1).cast("double")
                ),
                "w", 15, ("doc_id",),
            ).collect()
        )
        eq = exact_quantiles(
            table(spark, "/root/testdata/sf0.01", "orders").select(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("v")
            ),
            "v",
        ).collect()[0]
        cov = greedy_coverage_selection(docs, k=3, n=2)

        print(json.dumps({
            "master": master, "approx_distinct": ad, "dsir": dsir, "pr": pr,
            "einc_kept": einc, "bpe_merges": merges, "bpe_fp": bpe_fp,
            "lm": lm.asDict(), "km": km.asDict(), "zipf": zf.asDict(),
            "hits": ht, "lpa": lpa, "tri": tri.asDict(), "kcore": kc,
            "uv": uv, "winnow": wf.asDict(), "lmauc": lmauc.asDict(),
            "rich": rich.asDict(), "eq": eq.asDict(), "cov": cov,
            "tp": tp, "sb": sb.asDict(), "wsamp": wsamp,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
