"""Interleaved A/B (r13 VERDICT #4): `jaccard_contamination` fresh-path
per-doc shingle sizes as a WINDOW count carried on the exploded rows
(the r13 form, form W) vs the r12 TWO-SUBTREE form (separate
c_sizes/e_sizes aggregations joined back, form T) — at sf0.1 (1x) and
at the 10x replication tier (per-copy vowel isometries, the
tests/test_scale_contracts.py construction), W,T,W,T in one session
with contention sentinels.

Usage: python scripts/ab_jaccard_forms.py [--reps N] [--sf-dir DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce


def main() -> None:
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from bench import contention_sentinel
    from lakehouse_file_format_compare_spark.functions.numeric import grid
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        _cross_shingles,
    )
    from lakehouse_file_format_compare_spark.plans.hygiene_plans import (
        FDECON_TH,
        _fdecon_eval,
    )
    from lakehouse_file_format_compare_spark.session import build_session
    from lakehouse_file_format_compare_spark.sources.testdata import table

    spark = build_session(app_name="ab-jaccard-forms")
    spark.sparkContext.setLogLevel("ERROR")

    def form_w(corpus, ev):
        c_sh, e_sh = _cross_shingles(corpus, ev, 3, "doc_id", "text", "doc_id", "text")
        c2 = c_sh.withColumn("sz_c", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        e2 = e_sh.withColumn("sz_e", F.count(F.lit(1)).over(Window.partitionBy("eval_id")))
        common = (
            c2.join(F.broadcast(e2), "shingle")
            .groupBy("doc_id", "eval_id")
            .agg(F.count(F.lit(1)).alias("common"),
                 F.first("sz_c").alias("sz_c"), F.first("sz_e").alias("sz_e"))
        )
        return (
            common.withColumn(
                "jaccard",
                grid(F.col("common") / (F.col("sz_c") + F.col("sz_e") - F.col("common")), 6),
            )
            .where(F.col("jaccard") >= FDECON_TH)
            .select("doc_id", "eval_id", "jaccard")
        )

    def form_t(corpus, ev):
        c_sh, e_sh = _cross_shingles(corpus, ev, 3, "doc_id", "text", "doc_id", "text")
        c_sizes = c_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz_c"))
        e_sizes = e_sh.groupBy("eval_id").agg(F.count(F.lit(1)).alias("sz_e"))
        common = (
            c_sh.join(F.broadcast(e_sh), "shingle")
            .groupBy("doc_id", "eval_id")
            .agg(F.count(F.lit(1)).alias("common"))
        )
        return (
            common.join(c_sizes, "doc_id")
            .join(F.broadcast(e_sizes), "eval_id")
            .withColumn(
                "jaccard",
                grid(F.col("common") / (F.col("sz_c") + F.col("sz_e") - F.col("common")), 6),
            )
            .where(F.col("jaccard") >= FDECON_TH)
            .select("doc_id", "eval_id", "jaccard")
        )

    docs1 = table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = [
        docs1.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (F.regexp_replace("text", "[aeiou]", str(i)) if i else F.col("text")).alias("text"),
        )
        for i in range(10)
    ]
    docs10 = reduce(DataFrame.unionByName, copies)

    # equality check once (W and T must agree bit-for-bit)
    ev1 = _fdecon_eval(docs1)
    rw = sorted(map(tuple, form_w(docs1, ev1).collect()))
    rt = sorted(map(tuple, form_t(docs1, ev1).collect()))
    print(json.dumps({"forms_equal": rw == rt, "pairs": len(rw)}), flush=True)

    print(json.dumps({"sentinel_start": contention_sentinel(spark)}), flush=True)
    out: dict[str, list[float]] = {}
    for tier, corpus in (("1x", docs1), ("10x", docs10)):
        ev = _fdecon_eval(corpus)
        for i in range(reps):
            for key, fn in ((f"W_{tier}", form_w), (f"T_{tier}", form_t)):
                t0 = time.perf_counter()
                fn(corpus, ev).write.format("noop").mode("overwrite").save()
                w = round(time.perf_counter() - t0, 3)
                out.setdefault(key, []).append(w)
                print(json.dumps({key: w, "sentinel": contention_sentinel(spark)}),
                      flush=True)
    print(json.dumps({k: min(v) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
