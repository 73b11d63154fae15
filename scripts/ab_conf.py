"""Interleaved A/B of §9 session-config candidates (r13 VERDICT #5).

Each candidate conf-set runs the shuffle-heaviest bench entries in its
own fresh SparkSession (configs are session-fixed), alternating
BASE, CANDIDATE, BASE, CANDIDATE so host drift hits both sides.
Walls are min-of-reps per session; the bench contention sentinel
brackets every session.

Usage: python scripts/ab_conf.py <candidate-json> [--reps N]
e.g. python scripts/ab_conf.py '{"spark.sql.join.preferSortMergeJoin":"false"}'
"""

from __future__ import annotations

import json
import os
import sys
import time

ENTRIES = [
    "dedup_minhash_lsh",
    "pagerank_serving",
    "tokenizer_pipeline",
    "kmeans_serving",
    "corpus_hygiene_serving",
]


def main() -> None:
    cand = json.loads(sys.argv[1])
    reps = 2
    rounds = 2
    argv = sys.argv[2:]
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    if "--rounds" in argv:
        rounds = int(argv[argv.index("--rounds") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from bench import build_bench_queries, contention_sentinel, warm_up
    from lakehouse_file_format_compare_spark.session import build_session

    def run_session(tag: str, extra: dict) -> dict:
        spark = build_session(app_name=f"ab-conf-{tag}", extra_conf=extra)
        spark.sparkContext.setLogLevel("ERROR")
        queries = build_bench_queries()
        warm_up(spark, sf_dir, queries)
        out = {"sentinel": contention_sentinel(spark), "walls": {}}
        for name in ENTRIES:
            walls = []
            for _ in range(reps):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(round(time.perf_counter() - t0, 3))
            out["walls"][name] = min(walls)
        out["sentinel_end"] = contention_sentinel(spark)
        spark.stop()
        return out

    results: dict[str, list[dict]] = {"base": [], "cand": []}
    for _ in range(rounds):
        for tag, extra in (("base", {}), ("cand", cand)):
            r = run_session(tag, extra)
            results[tag].append(r)
            print(json.dumps({tag: r}), flush=True)
    summary = {
        tag: {
            e: min(r["walls"][e] for r in rs) for e in ENTRIES
        }
        for tag, rs in results.items()
    }
    summary["candidate"] = cand
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
