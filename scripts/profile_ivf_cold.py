"""Break down the sim_knn_ivf COLD bench cost (r5 verdict #1: cold
3.10s -> 7.26s between BENCH_r04 and BENCH_r05 while steady stayed
flat ~1.0s).

Hypothesis: fe3046a (round 5) moved IVF centroid scoring and candidate
cosine from JVM HOF folds to Arrow pandas UDFs (a measured 1.7s/2k-row
steady-state win). In the bench sequence sim_knn_ivf is the FIRST
query whose plan contains any Python UDF, so its cold run now also
pays the session's one-time Python-worker pool spin-up: daemon fork +
per-worker `import pandas` (~0.5s each, serialized per core touched) +
Arrow serializer init. That is session infrastructure, not plan cost.

Modes (run each in a FRESH process):
  plain    — replicate the bench sequence: JVM warm-up query, then
             timed centroid training, then timed first/second knn_ivf.
  warmudf  — same, but first run one trivial pandas-UDF query to
             spin up the Python worker pool. If the cold knn_ivf
             drops to ~r4 levels, the regression is the one-time
             worker-pool cost, not a plan regression.

Usage: python scripts/profile_ivf_cold.py [plain|warmudf]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "plain"
    sf_dir = "/root/testdata/sf0.1"

    t0 = time.perf_counter()
    from lakehouse_file_format_compare_spark.plans import all_queries, similarity_plans
    from lakehouse_file_format_compare_spark.session import build_session

    t_import = time.perf_counter() - t0

    t0 = time.perf_counter()
    spark = build_session(app_name="ivf-cold-profile")
    spark.sparkContext.setLogLevel("ERROR")
    t_session = time.perf_counter() - t0

    queries = all_queries()

    # bench.py's untimed JVM/codegen warm-up (no Python UDF inside)
    t0 = time.perf_counter()
    queries["tpch_local_supplier_volume"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t_warm_jvm = time.perf_counter() - t0

    t_warm_py = 0.0
    if mode == "warmudf":
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("double")
        def _noop(x):
            return x

        t0 = time.perf_counter()
        (
            spark.range(64)
            .select(_noop(F.col("id").cast("double")).alias("v"))
            .write.format("noop").mode("overwrite").save()
        )
        t_warm_py = time.perf_counter() - t0

    from lakehouse_file_format_compare_spark.sources.testdata import table

    emb = table(spark, sf_dir, "embeddings")

    t0 = time.perf_counter()
    import lakehouse_file_format_compare_spark.operators.similarity as S

    centroids = S.train_ivf_centroids(emb, n_lists=16)
    t_train = time.perf_counter() - t0

    def run() -> float:
        q = emb.where(F.col("vec_id") % similarity_plans.QUERY_MOD == 0)
        t0 = time.perf_counter()
        S.knn_ivf(
            q, emb, k=similarity_plans.K, n_lists=16,
            nprobe=similarity_plans.IVF_NPROBE, centroids=centroids,
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t_first = run()
    t_second = run()

    print(json.dumps({
        "mode": mode,
        "t_import": round(t_import, 3),
        "t_session": round(t_session, 3),
        "t_warm_jvm": round(t_warm_jvm, 3),
        "t_warm_py_udf": round(t_warm_py, 3),
        "t_train_centroids": round(t_train, 3),
        "t_knn_ivf_first": round(t_first, 3),
        "t_knn_ivf_second": round(t_second, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
