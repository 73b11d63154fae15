"""Dump the PageRank LOOP-BODY physical plan (r14, judge evidence).

:func:`operators.pagerank.pagerank` executes eagerly (the final
``localCheckpoint(eager=True)`` is part of the operator contract), so
``explain()`` on its result only shows the checkpointed-result scan.
This script rebuilds the loop invariants exactly as the operator does
(same repartition+persist, same count) and explains the
``_pagerank_iteration`` frame for iteration 1 and iteration 2 — the
per-iteration join/exchange shape the r13 pre-partitioned persists
claim to improve. Writes ``<out_dir>/pagerank_loop_iter{1,2}.txt``.

Usage: python scripts/explain_pagerank_loop.py <out_dir> [--sf-dir DIR]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.pagerank import (
        UNIT,
        _pagerank_iteration,
    )
    from lakehouse_file_format_compare_spark.plans.corpus_plans import _pr_edges
    from lakehouse_file_format_compare_spark.session import build_session
    from lakehouse_file_format_compare_spark.sources.testdata import table

    spark = build_session(app_name="explain-pagerank-loop")
    spark.sparkContext.setLogLevel("ERROR")

    # mirror pagerank()'s invariant setup verbatim (operator lines are
    # the source of truth; this script exists only because the operator
    # executes eagerly)
    edges = _pr_edges(table(spark, sf_dir, "documents"))
    e = (
        edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = (
        nodes.join(deg, "node", "left")
        .select("node",
                F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = base.count()
    dp, un = 85, UNIT
    tele = ((100 - dp) * un) // (100 * n)
    r = base.select("node", "out_deg", F.lit(un // n).cast("long").alias("rank"))

    def _dump(df, name):
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(txt)
        import re

        counts = {
            k: len(re.findall(rf"\b{k}\b", txt))
            for k in ("Exchange", "SortMergeJoin", "BroadcastHashJoin",
                      "ShuffledHashJoin", "InMemoryTableScan", "Sort")
        }
        print(name, counts, flush=True)

    r1 = _pagerank_iteration(r, e, base, n=n, dp=dp, tele=tele)
    _dump(r1, "pagerank_loop_iter1.txt")
    r2 = _pagerank_iteration(r1, e, base, n=n, dp=dp, tele=tele)
    _dump(r2, "pagerank_loop_iter2.txt")

    # the routed-join + grouped-sum half of the step hides behind the
    # iteration's lazy checkpoint in the dumps above — explain it
    # directly (pre-checkpoint) so the e-side exchange claim is visible
    routed = r1.join(e, r1["node"] == e["src"], "left").select(
        F.when(F.col("out_deg") > 0, F.col("dst"))
        .otherwise(F.lit(-1)).cast("long").alias("__to"),
        F.when(F.col("out_deg") > 0, F.expr("rank div out_deg"))
        .otherwise(F.col("rank")).cast("long").alias("__mass"),
    )
    inc = routed.groupBy(F.col("__to").alias("node")).agg(
        F.sum("__mass").cast("long").alias("__in")
    )
    _dump(inc, "pagerank_loop_inc_prechkpt.txt")
    spark.stop()


if __name__ == "__main__":
    main()
