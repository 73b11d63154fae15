"""Interleaved A/B: pagerank loop-invariant persists WITH vs WITHOUT
pre-partitioning (the only r12→r13 diff in operators/pagerank.py).

Both variants run the identical 6-iteration cascade
(`_pagerank_iteration`) to an eager localCheckpoint, interleaved
A,B,A,B,... in one session with the bench contention sentinel timed
around every rep — the only protocol that discriminates on this host
(OPTIMIZATION_r13.md "Measurement honesty").

Usage: python scripts/ab_pagerank.py [--reps N] [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    reps = 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from bench import contention_sentinel
    from lakehouse_file_format_compare_spark.operators.pagerank import (
        UNIT,
        _pagerank_iteration,
    )
    from lakehouse_file_format_compare_spark.plans.corpus_plans import (
        PR_ITERS,
        _pr_edges,
    )
    from lakehouse_file_format_compare_spark.session import build_session
    from lakehouse_file_format_compare_spark.sources.testdata import table

    spark = build_session(app_name="ab-pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    def run(prepartition: bool) -> float:
        edges = _pr_edges(table(spark, sf_dir, "documents"))
        t0 = time.perf_counter()
        e = edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        if prepartition:
            e = e.repartition(F.col("src"))
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
        nodes = e.select(F.col("src").alias("node")).unionByName(
            e.select(F.col("dst").alias("node"))
        ).distinct()
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("out_deg")
        )
        # base inherits hash(node) partitioning from nodes.distinct()
        # through the left join in both variants (r14 — the former
        # explicit repartition(node) was a redundant exchange)
        base = nodes.join(deg, "node", "left").select(
            "node",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n = base.count()
        dp, un = 85, UNIT
        tele = ((100 - dp) * un) // (100 * n)
        r = base.select(
            "node", "out_deg", F.lit(un // n).cast("long").alias("rank")
        )
        for _ in range(PR_ITERS):
            r = _pagerank_iteration(r, e, base, n=n, dp=dp, tele=tele)
        out = r.select("node", F.col("rank").cast("long").alias("rank"))
        out = out.localCheckpoint(eager=True)
        base.unpersist()
        e.unpersist()
        out.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        return round(wall, 3)

    out = {"sentinel_start": contention_sentinel(spark), "A_prepart": [],
           "B_flat": [], "jobs": {}}
    for i in range(reps):
        for key, flag in (("A_prepart", True), ("B_flat", False)):
            before = set(tracker.getJobIdsForGroup(None) or [])
            w = run(flag)
            after = set(tracker.getJobIdsForGroup(None) or [])
            out[key].append({"wall": w, "jobs": len(after - before),
                             "sentinel": contention_sentinel(spark)})
            print(json.dumps({key: out[key][-1]}), flush=True)
    amin = min(x["wall"] for x in out["A_prepart"])
    bmin = min(x["wall"] for x in out["B_flat"])
    print(json.dumps({"A_prepart_min": amin, "B_flat_min": bmin}))
    spark.stop()


if __name__ == "__main__":
    main()
