"""Per-query profiler (r13, guide §1): time a bench entry to the noop
sink in THIS session, count Spark jobs/stages/tasks it launches, and
optionally dump ``explain("formatted")``.

Usage:
    python scripts/profile_query.py <entry> [<entry> ...] [--reps N]
        [--explain-dir DIR] [--sf-dir DIR]

Jobs are counted via the status tracker (job ids observed between the
start and end of each rep), which separates scheduling-bound entries
(many tiny jobs) from data-bound ones (few jobs, heavy stages).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    explain_dir = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reps":
            reps = int(argv[i + 1])
            args.remove(argv[i + 1])
        elif a == "--explain-dir":
            explain_dir = argv[i + 1]
            args.remove(argv[i + 1])
        elif a == "--sf-dir":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_queries, warm_up
    from lakehouse_file_format_compare_spark.session import build_session

    spark = build_session(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_bench_queries()
    warm_up(spark, sf_dir, queries)
    tracker = spark.sparkContext.statusTracker()

    # r13: the host is a shared sandbox with invisible neighbor load —
    # the bench's contention sentinel (fixed plan-independent JVM
    # micro-query) brackets every entry so A/B walls can be read
    # against CPU availability at measurement time.
    from bench import contention_sentinel

    out = {"sentinel_start": contention_sentinel(spark), "queries": {}}
    print(json.dumps({"sentinel_start": out["sentinel_start"]}), flush=True)
    for name in args:
        fn = queries[name]
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        walls, jobs = [], []
        for _ in range(reps):
            before = set(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            after = set(tracker.getJobIdsForGroup(None) or [])
            jobs.append(len(after - before))
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = {
            "walls": walls,
            "min": min(walls),
            "jobs": jobs,
            "sentinel": contention_sentinel(spark),
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()
