"""Benchmark harness: runs the headline query set at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output protocol (r8, from the r7 verdict #2/#3):
- the LAST stdout line is a compact JSON summary (metric, value,
  queries map, value_steady, sf, sentinel, loadavg) kept under the
  driver's 2,000-char tail capture — r7's single 3.5 KB line lost its
  head to that capture and the round's official artifact was
  unparseable;
- the line before it is the FULL detail JSON (steady per-rep walls,
  format_bench, formats), also written to ``BENCH_DETAIL.json``
  next to this file so the detail survives in-repo regardless of
  how much stdout the driver keeps.

Noise robustness (r7 verdict #3): two rounds running, the driver's
recorded run landed on a contended host and the committed walls ran
2x+ the builder's clean runs. Contention noise is strictly additive,
so the steady figure per query is now the MIN over >=3 reps (per-rep
walls recorded in the detail).

Cold protocol (r9, r8 verdict #5): cold = plan compile + first IO,
both additive-noise like everything else, so a single cold sample is
just as contention-exposed as the steady walls were. The cold figure
is now the per-query MIN over 2 reps, each in a FRESH session: rep 1
runs in a ``--cold-probe`` subprocess (its own JVM, same warm-up
discipline), rep 2 in this process before the steady loop. Both reps
are recorded in the detail as ``cold_reps``; if the probe subprocess
fails, the single in-process rep stands (noted in
``cold_protocol``).

Each query executes to a ``noop`` sink (full execution, no driver
materialization cost), mirroring how the reference's gold stage
writes tables rather than collecting (dags/3_silver_to_gold.py:188-195).
"""

from __future__ import annotations

import json
import os
import sys
import time

from lakehouse_file_format_compare_spark.plans import all_queries, similarity_plans
from lakehouse_file_format_compare_spark.session import build_session
from lakehouse_file_format_compare_spark.storage import available_formats

HEADLINE = [
    "gold_monthly_balance",
    "gold_customer_summary",
    "gold_daily_transaction_metrics",
    "gold_product_ranking",
    "tpch_pricing_summary",
    "tpch_shipping_priority",
    "tpch_local_supplier_volume",
    "dedup_exact",
    "text_quality",
    "text_token_stats",
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    "stream_tumbling_window",
    "stream_hourly_rollup",
    "op_window_functions_suite",
    "op_merge_upsert",
    "op_asof_join",
    "op_range_join",
    # r5 surfaces added to the round-over-round signal (r5 verdict #3)
    "op_sessionization",
    "corpus_hygiene_suite",
    "fintech_gold_suite",
    "dedup_minhash_lsh",
    # r6: raw PQ serving path (quality is driver-checked via
    # similarity_scale_suite; this tracks the ADC-scan wall)
    "sim_knn_pq",
    # r7 (r6 verdict #4): the hygiene SERVING path — the per-batch
    # production cost, without the contract row's built-in
    # verification (LSH recall cross-check / second decon engine);
    # the contract row stays benched so the two are separable.
    "corpus_hygiene_serving",
    # r7: SemDeDup raw pairing (cluster-bounded cosine near-dup over
    # the same planted-clone corpus the suite certifies; centroid
    # training untimed per the ANN train-once model)
    "dedup_semantic",
    # r7 continuation: behavioral analytics over events (funnel /
    # retention / MAD outliers — the suite IS the serving path, no
    # embedded verification) and the DSIR selection serving path
    # (the driver contract lives in corpus_build_summary's dsir_*)
    "events_analytics_suite",
    "dsir_resample",
    # r8 (r7 verdict #6): reference-parity fintech gold stage (q1-q4
    # only) benched separately from the contract row, whose wall grows
    # with extension coverage (q5 SCD2 / q6 change feed landed in r7)
    "fintech_gold_serving",
    # r8: fixed-point PageRank over the documents citation graph (the
    # serving path of the corpus_build_summary pr_* contract)
    "pagerank_serving",
    # r9: distribution-shift family — per-source token divergence
    # report over documents, and the windowed-PSI drift monitor over
    # events (driver contracts live in text_lang_id div_*/psi_* and
    # stream_tumbling_window sdrift_*)
    "divergence_serving",
    "drift_monitor_serving",
    # r10 (r9 verdict #2): the tokenizer-training scalars (the r9
    # vocab_*/bpe_* widening) get their own wall; text_token_stats
    # goes back to timing the raw per-doc serving path so the
    # longitudinal signal survives the widening (the r9 entry
    # silently included this cost and stepped 4.5x).
    "tokenizer_stats_serving",
    # r10: incremental embedding dedup per-batch serving wall (new
    # half vs the materialized signature store of the old half;
    # driver contract lives in dedup_embedding's einc_*)
    "incremental_embedding_serving",
    # r10: bigram-LM perplexity filter (train on the en slice + score
    # the corpus; driver contract lives in text_quality's lm_*, which
    # is benched as the raw per-doc path under the original name)
    "lm_perplexity_serving",
    # r10: distributed k-means fit over the full embeddings table
    # (driver contract lives in sim_vector_stats' km_*)
    "kmeans_serving",
    # r10 late-round: the three tokenizer APPLY paths (BPE fold /
    # unigram Viterbi / WordPiece greedy) under the fixed literal
    # models — driver contracts live in text_token_stats'
    # bpea_*/uv_*/wp_*
    "tokenizer_apply_serving",
    # r10 continuation: LM-filter evaluation block (AUC + threshold
    # sweep + per-source AUC + KS over one shared scored frame) —
    # driver contracts in text_quality's lmauc_*/lmth_*/gauc_*/lmks_*
    "filter_eval_serving",
    # r10 continuation: winnowing fingerprint selection over the full
    # corpus (per-doc window only) — driver contract in
    # text_fingerprints' wf_*
    "winnow_serving",
    # r11 (r10 verdict #5): the end-to-end tokenizer pipeline (train
    # on the corpus -> apply the trained model -> budget report, all
    # three families in one row) — the comparable
    # tokenize-the-corpus number; driver contract is the
    # tokenizer_pipeline registry row with a full train+apply oracle
    "tokenizer_pipeline",
    # r11: trigram stupid-backoff LM filter (train + score the
    # corpus) — driver contract lives in text_quality's sb_*
    "sb_perplexity_serving",
    # r12: the composed end-to-end corpus build (clean -> dedup x2 ->
    # LM filter -> decon -> split -> pack -> datasheet) as ONE entry —
    # the integration wall, distinct from the per-stage serving
    # entries above
    "corpus_pipeline",
]

STEADY_REPS = 3  # min-of-N steady protocol (r7 verdict #3)


def _loadavg() -> list[float]:
    """1/5/15-minute host load averages (Linux); [] where unsupported."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def _sentinel(spark) -> float:
    """Contention sentinel: a fixed, plan-independent JVM micro-query.

    Timed once at suite start and once at suite end (r6 verdict #1):
    the workload never changes between rounds, so any drift in its
    wall time measures HOST contention during the run, not plan cost.
    A round whose start/end sentinels disagree with a prior round's
    (or with each other) flags its per-query timings as noisy data —
    machine-detectably, instead of by post-hoc argument.

    Pure whole-stage-codegen arithmetic over ``spark.range`` — no IO,
    no shuffle variance, no Python workers — so the number isolates
    CPU availability.
    """
    from pyspark.sql import functions as F

    start = time.perf_counter()
    spark.range(20_000_000, numPartitions=32).select(
        F.sum((F.col("id") * 2 + 1) % 7).alias("s")
    ).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - start, 3)


# public alias for out-of-repo tooling (scripts/profile_query.py):
# the underscored name stays for the bench's own internal use
contention_sentinel = _sentinel


def build_bench_queries() -> dict:
    queries = all_queries()
    # bench times the raw serving paths, not the driver-facing recall
    # contracts (which deliberately also run the exact baselines —
    # dedup_minhash_lsh's contract executes the full n-gram Jaccard
    # true-pair set in three subplans)
    queries["sim_knn_ivf"] = similarity_plans.knn_ivf
    queries["sim_knn_lsh"] = similarity_plans.knn_lsh
    queries["sim_knn_pq"] = similarity_plans.knn_pq_serving
    from lakehouse_file_format_compare_spark.plans import dedup_plans, hygiene_plans

    queries["dedup_minhash_lsh"] = dedup_plans.minhash_lsh
    queries["corpus_hygiene_serving"] = hygiene_plans.corpus_hygiene_serving
    queries["dedup_semantic"] = similarity_plans.semantic_dedup_serving
    from lakehouse_file_format_compare_spark.plans import corpus_plans

    queries["dsir_resample"] = corpus_plans.dsir_resample_serving
    from lakehouse_file_format_compare_spark.plans import fintech_plans

    queries["fintech_gold_serving"] = fintech_plans.gold_serving

    def _pagerank_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.operators.pagerank import pagerank
        from lakehouse_file_format_compare_spark.plans.corpus_plans import (
            PR_ITERS,
            _pr_edges,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import table

        return pagerank(
            _pr_edges(table(spark_, sf_dir_, "documents")), iterations=PR_ITERS
        )

    queries["pagerank_serving"] = _pagerank_serving

    # r9: the driver row gained the streaming heavy-hitters drain
    # (shh_* widening); bench keeps timing the raw hourly rollup so
    # the entry stays comparable across rounds (widening cost is a
    # verification artifact, not the serving path)
    def _hourly_rollup_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.operators.rollup import time_rollup
        from lakehouse_file_format_compare_spark.sources.testdata import table

        return time_rollup(table(spark_, sf_dir_, "events"), bucket="1 hour")

    queries["stream_hourly_rollup"] = _hourly_rollup_serving

    # r9: same pattern for the tumbling row's sdrift_* widening —
    # bench times the raw tumbling windows
    def _tumbling_serving(spark_, sf_dir_):
        from pyspark.sql import functions as F

        from lakehouse_file_format_compare_spark.functions.numeric import grid
        from lakehouse_file_format_compare_spark.sources.testdata import table

        events = table(spark_, sf_dir_, "events")
        return (
            events.groupBy(
                F.window("ts", "10 minutes").alias("w"), F.col("event_type")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                grid(F.sum(grid(F.col("value"), 2)), 2).alias("volume"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "volume",
            )
        )

    queries["stream_tumbling_window"] = _tumbling_serving

    # r9: the drift monitor's own serving wall (windowed PSI vs the
    # full-table baseline — the new operator, timed without the
    # tumbling row it widens)
    def _drift_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.operators.divergence import (
            windowed_psi_vs_baseline,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import table

        ev = table(spark_, sf_dir_, "events")
        return windowed_psi_vs_baseline(ev, ev)

    queries["drift_monitor_serving"] = _drift_serving

    # r9: per-source token divergence + PSI report serving path
    # (driver contract lives in text_lang_id's div_*/psi_* scalars)
    def _divergence_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.operators.divergence import (
            token_divergence_report,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import table

        return token_divergence_report(
            table(spark_, sf_dir_, "documents"), "source"
        )

    queries["divergence_serving"] = _divergence_serving

    # r10 (r9 verdict #2): the driver row computes vocab_*/bpe_*
    # in-row since r9 — bench times the raw per-doc path and the
    # tokenizer-training scalars as separate entries
    from lakehouse_file_format_compare_spark.plans import text_plans

    queries["text_token_stats"] = text_plans.token_stats_serving
    queries["tokenizer_stats_serving"] = text_plans.tokenizer_stats

    # r10: text_quality gained the lm_* bigram-LM widening — bench
    # the raw per-doc path under the original entry name and the LM
    # train+score block as its own entry (same split discipline).
    queries["text_quality"] = text_plans.quality_serving
    queries["lm_perplexity_serving"] = text_plans.lm_perplexity

    # r11: trigram stupid-backoff filter (text_quality's sb_* driver
    # widening) — its train+score block timed as its own entry
    def _sb_serving(spark_, sf_dir_):
        from pyspark.sql import functions as _F

        from lakehouse_file_format_compare_spark.operators.lm import (
            stupid_backoff_report,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import (
            table as _table,
        )

        return stupid_backoff_report(
            _table(spark_, sf_dir_, "documents"), _F.col("lang") == "en"
        )

    queries["sb_perplexity_serving"] = _sb_serving
    queries["kmeans_serving"] = similarity_plans.kmeans_serving
    queries["tokenizer_apply_serving"] = text_plans.tokenizer_apply_serving

    from lakehouse_file_format_compare_spark.plans import dedup_plans as _dp

    queries["incremental_embedding_serving"] = _dp.incremental_embedding_serving

    # r10 continuation: the full evaluation block over the LM filter
    # (train + score + AUC + threshold sweep + per-source AUC + KS) —
    # driver contracts live in text_quality's lmauc_*/lmth_*/gauc_*/
    # lmks_*; this times what a production filter-evaluation run costs
    def _filter_eval_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.plans.text_plans import (
            _lm_auc_scalars,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import table

        return _lm_auc_scalars(table(spark_, sf_dir_, "documents"))

    queries["filter_eval_serving"] = _filter_eval_serving

    def _winnow_serving(spark_, sf_dir_):
        from lakehouse_file_format_compare_spark.operators.winnow import (
            winnow_fingerprints,
        )
        from lakehouse_file_format_compare_spark.sources.testdata import table

        return winnow_fingerprints(table(spark_, sf_dir_, "documents"))

    queries["winnow_serving"] = _winnow_serving
    return queries


def warm_up(spark, sf_dir: str, queries: dict) -> None:
    """Untimed one-time session costs, applied identically in every
    session that measures (parent and cold-probe subprocess)."""
    # JVM/codegen warm-up on an untimed tiny query
    queries["tpch_local_supplier_volume"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Python-worker-pool warm-up (untimed, same class as the JVM one):
    # daemon fork + per-worker pandas import + Arrow serializer init is
    # ~2.2s of one-time session cost that otherwise lands entirely on
    # whichever query first contains a pandas UDF — measured as the r5
    # sim_knn_ivf cold "regression" (PROFILE_r06.md: 3.1->7.3s cold
    # while steady stayed flat; scripts/profile_ivf_cold.py).
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x

    spark.range(64).select(_warm(F.col("id").cast("double"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # ANN index training is untimed (train once, serve many — the
    # deployment model): without this, the first sim_knn_ivf /
    # sim_knn_pq cold run would conflate one-time training with the
    # serving wall the bench exists to track.
    from lakehouse_file_format_compare_spark.sources.testdata import table as _table

    _emb = _table(spark, sf_dir, "embeddings")
    similarity_plans._centroids(_emb, sf_dir)
    similarity_plans._codebooks(_emb, sf_dir)


def cold_pass(spark, sf_dir: str, queries: dict) -> dict[str, float]:
    """First (cold) execution of every headline query: plan compile +
    first IO. Must run in a warmed but otherwise virgin session."""
    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
    return timings


def _cold_probe_main(sf_dir: str) -> None:
    """Subprocess entry (``bench.py --cold-probe``): fresh JVM, same
    warm-up discipline, ONE cold pass, one JSON line on stdout."""
    spark = build_session(app_name="lakehouse-ffc-bench-coldprobe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_bench_queries()
    warm_up(spark, sf_dir, queries)
    timings = cold_pass(spark, sf_dir, queries)
    print(json.dumps({"cold": timings}))
    sys.stdout.flush()
    spark.stop()


def _spawn_cold_probe(sf_dir: str) -> dict[str, float] | None:
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cold-probe"],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir),
        )
        if out.returncode != 0:
            return None
        return json.loads(out.stdout.strip().splitlines()[-1])["cold"]
    except Exception:  # noqa: BLE001 — probe is best-effort
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    if "--cold-probe" in sys.argv:
        _cold_probe_main(sf_dir)
        return

    # cold rep 1: fresh subprocess JVM (r9 cold protocol)
    probe_cold = _spawn_cold_probe(sf_dir)

    spark = build_session(app_name="lakehouse-ffc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_bench_queries()
    warm_up(spark, sf_dir, queries)

    load_start = _loadavg()
    sentinel_start = _sentinel(spark)

    # cold rep 2: this (equally fresh) session
    local_cold = cold_pass(spark, sf_dir, queries)
    cold_reps: dict[str, list[float]] = {
        name: ([probe_cold[name]] if probe_cold and name in probe_cold else [])
        + [local_cold[name]]
        for name in HEADLINE
    }
    timings = {name: min(reps) for name, reps in cold_reps.items()}
    cold_protocol = (
        "min of 2 reps, fresh session each" if probe_cold
        else "single rep (cold-probe subprocess failed)"
    )

    steady: dict[str, float] = {}
    steady_reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        # steady runs: whole-stage-codegen compiled, JIT warm — the
        # per-query cost that amortizes at scale. MIN over N reps:
        # host-contention noise is strictly additive, so the min is
        # the honest plan cost (r7 verdict #3 — two rounds of
        # committed artifacts were 2x+ inflated by a contended host).
        # Per-rep walls are kept as data in the detail JSON.
        reps = []
        for _ in range(STEADY_REPS):
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - start, 3))
        steady_reps[name] = reps
        steady[name] = min(reps)

    sentinel_end = _sentinel(spark)
    load_end = _loadavg()

    # the reference's HEADLINE axis — identical workload per storage
    # format — recorded per-round as its own sub-object (not part of
    # the headline totals). Fixed sf0.01 (resolved relative to the
    # configured testdata root, not hardcoded) keeps the csv/json
    # writes bounded; avro/delta/iceberg rows appear automatically
    # when their jars exist. Guarded: a format-bench failure must
    # never discard the already-measured headline results.
    import tempfile
    from dataclasses import asdict

    from lakehouse_file_format_compare_spark.format_bench import (
        run_codec_bench,
        run_format_bench,
    )

    fb_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    try:
        with tempfile.TemporaryDirectory(prefix="format_bench_") as fb_root:
            fb = [asdict(r) for r in run_format_bench(spark, fb_dir, fb_root)]
    except Exception as e:  # noqa: BLE001 — headline JSON must survive
        fb = {"error": str(e)[:200]}
    try:
        with tempfile.TemporaryDirectory(prefix="codec_bench_") as cb_root:
            cb = [asdict(r) for r in run_codec_bench(spark, fb_dir, cb_root)]
    except Exception as e:  # noqa: BLE001
        cb = {"error": str(e)[:200]}

    avail = available_formats(spark)
    sentinel = {"start": sentinel_start, "end": sentinel_end}
    loadavg = {"start": load_start, "end": load_end}
    # full detail: everything, including per-rep steady walls and the
    # per-format sub-bench — printed BEFORE the summary and persisted
    # next to this file so it survives the driver's stdout tail capture
    detail = {
        "metric": "headline_suite_detail",
        "unit": "sec",
        "sf": sf,
        "queries_cold": timings,
        "cold_reps": cold_reps,
        "cold_protocol": cold_protocol,
        "queries_steady": steady,
        "steady_reps": steady_reps,
        "steady_protocol": f"min of {STEADY_REPS} reps",
        # environment-blocked formats recorded as data, not silence:
        # the format axis (Iceberg × {parquet,orc,avro}) needs jars the
        # container doesn't ship; the conf + runtime probe exist
        "formats_available": list(avail),
        "formats_unavailable": [
            f for f in ("avro", "delta", "iceberg") if f not in avail
        ],
        "sentinel_sec": sentinel,
        "loadavg": loadavg,
        # per-format write/scan/query/size for the identical workload
        # (the reference's core comparison), at fixed sf0.01, plus the
        # compression-codec axis over the lineitem fact table
        "format_bench": {"sf": 0.01, "results": fb},
        "codec_bench": {"sf": 0.01, "results": cb},
    }
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # stdout detail line still carries everything
    print(json.dumps(detail))

    # compact summary LAST: must fit the driver's 2,000-char stdout
    # tail capture (r7's 3.5 KB single line lost its head there).
    # Contention sentinel (r6 verdict #1): the SAME fixed JVM
    # micro-query timed before and after the suite, plus host loadavg
    # — compare across rounds to separate host noise from plan cost.
    result = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_steady": round(sum(steady.values()), 3),
        "sf": sf,
        "sentinel_sec": sentinel,
        "loadavg": loadavg,
        "detail": "prior line + BENCH_DETAIL.json",
    }
    line = json.dumps(result)
    if len(line) > 1900:  # belt and braces: never outgrow the capture
        for drop in ("detail", "loadavg", "queries"):
            result.pop(drop, None)
            line = json.dumps(result)
            if len(line) <= 1900:
                break
    print(line)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
