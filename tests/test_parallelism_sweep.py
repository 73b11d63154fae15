"""Parallelism-sweep tier (r8, from the r7 verdict): every
order/partitioning-invariance contract is re-run at local[2] and
local[32] in fresh subprocesses and compared against the in-suite
local[8] session.

Why: r7 pinned ``hll_rollup_order_invariant`` as strict estimate
equality; it passed at the suite's local[8] and failed at the
driver's local[32] — DataSketches HLL register state depends on
per-partition insertion order (LIST->SET->HLL_4 promotion points),
so invariance claims verified at one parallelism level are not
verified. This tier makes the parallelism axis part of CI.

What must hold at EVERY level:
- all boolean contract columns of the ``approx_distinct_sketch_rollup``
  row (the four-family frame; driver-demoted r10, swept here)
  are true (HLL envelope + both-paths tolerance, row conservation,
  CMS >= truth, histogram merge fingerprint equality)
- the deterministic-integer columns (exact counts, Misra-Gries
  top-k, CMS point estimate, histogram bins/fingerprints) are
  IDENTICAL across local[2]/local[8]/local[32] — they are integer
  math with engine-portable hashes, so parallelism must not move
  them at all
- DSIR grid-snapped importance weights are identical across levels
  (the repartition-invariance contract, now swept across masters)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# booleans: must be true everywhere; ints/strings: must be identical
# across parallelism levels (deterministic integer math)
BOOL_COLS = [
    "approx_within_tolerance",
    "hll_rollup_within_tolerance",
    "hll_rollup_rows_conserved",
    "hll_rollup_paths_within_tolerance",
    "mg_rows_conserved",
    "cms_ge_truth",
    "cms_rows_conserved",
    "qh_rows_conserved",
    "qh_merge_order_invariant",
]
EXACT_COLS = [
    "o_orderstatus",
    "exact_customers",
    "n_orders",
    "mg_top1_key",
    "mg_top1_lb",
    "mg_bound_total",
    "mg_topk_fp",
    "cms_heavy_est",
    "qh_p50_bin",
    "qh_p95_bin",
    "qh_fp",
]


def _probe(master: str, shuffle: int, conf: dict | None = None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # keep the probe JVMs lean; three never run concurrently
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "parallelism_probe.py"),
           master, str(shuffle)]
    if conf:
        cmd.append(json.dumps(conf))
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_invariance_contracts_across_parallelism(spark):
    """The headline sweep: local[2] and local[32] subprocesses vs the
    in-suite local[8] session."""
    from lakehouse_file_format_compare_spark.operators.importance import (
        importance_weights,
    )
    from lakehouse_file_format_compare_spark.plans.adhoc import (
        approx_distinct_sketch_rollup as approx_distinct,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    # in-suite local[8] reference
    ref_ad = [
        r.asDict()
        for r in sorted(
            approx_distinct(spark, "/root/testdata/sf0.01").collect(),
            key=lambda r: r["o_orderstatus"],
        )
    ]
    docs = table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.where(F.col("doc_id") % 10 == 0)
    ref_dsir = sorted(
        [r["doc_id"], r["n_tokens"], r["weight"]]
        for r in importance_weights(docs, target).collect()
    )
    from lakehouse_file_format_compare_spark.operators.pagerank import pagerank
    from lakehouse_file_format_compare_spark.plans.corpus_plans import _pr_edges

    ref_pr = sorted(
        [r["node"], r["rank"]]
        for r in pagerank(_pr_edges(docs), iterations=4).collect()
    )
    for row in ref_ad:
        for c in BOOL_COLS:
            assert row[c] is True, ("local[8]", row["o_orderstatus"], c, row)

    # r9 (verdict #1): sweep not only the master string but the two
    # knobs that change PARTIAL-aggregation layout at a fixed core
    # count — the r8 driver red came from a layout no master-only
    # sweep produced. 64 KiB maxPartitionBytes splits the sf0.01
    # parquet into dozens of input slices; default.parallelism=7
    # perturbs every non-shuffle stage width.
    layout_conf = {"spark.sql.files.maxPartitionBytes": "65536",
                   "spark.default.parallelism": "7"}
    sweep = [("local[2]", 2, None), ("local[32]", 32, None),
             ("local[32]", 32, layout_conf)]
    sweep_ref: dict = {}  # r10 keys compare level-vs-level
    for master, shuffle, conf in sweep:
        got = _probe(master, shuffle, conf)
        ad = got["approx_distinct"]
        assert len(ad) == len(ref_ad)
        for row, ref in zip(ad, ref_ad):
            for c in BOOL_COLS:
                assert row[c] is True, (master, row["o_orderstatus"], c, row)
            for c in EXACT_COLS:
                assert row[c] == ref[c], (master, row["o_orderstatus"], c,
                                          row[c], ref[c])
        assert [list(t) for t in got["dsir"]] == [list(t) for t in ref_dsir], (
            master, "dsir weights moved across parallelism")
        assert [list(t) for t in got["pr"]] == [list(t) for t in ref_pr], (
            master, "pagerank integer ranks moved across parallelism")
        # r10: incremental-embedding fold kept set, BPE train/apply,
        # LM perplexity report, k-means facts and the Zipf fit are
        # deterministic — compare levels against each other
        # r11 keys: tokenizer pipeline (trained BPE + seed-vocab
        # budgets), stupid-backoff report, weighted-sample winners —
        # and lmauc now carries the lmcal_* isotonic scalars
        for key in ("einc_kept", "bpe_merges", "bpe_fp",
                    "lm", "km", "zipf", "hits", "lpa", "tri", "kcore",
                    "uv", "winnow", "lmauc", "rich", "eq", "cov",
                    "tp", "sb", "wsamp"):
            assert got[key] == sweep_ref.setdefault(key, got[key]), (
                master, key, "moved across parallelism")
