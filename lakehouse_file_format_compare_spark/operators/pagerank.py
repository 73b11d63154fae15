"""PageRank-style link-graph quality prior — power iteration as join
algebra, in exact fixed-point integer arithmetic.

Why it belongs in a training-data pipeline: web-corpus curation
weights documents by link-graph centrality (the classic quality prior
over a crawl graph — PageRank, Brin & Page 1998; harmonic centrality
in Common Crawl ranking). The reference has no graph surface (its
DAGs stop at fintech gold aggregates); this extends the graph family
started by connected components (operators/components.py) with the
ranking half.

Determinism design (what makes the DuckDB oracle possible): floating
point power iteration is NOT order-invariant — a distributed sum of
doubles depends on partitioning, so no float formulation can be
pinned bit-exact across engines. Ranks here are fixed-point LONGS in
units of 1e-9 (``unit``), every division is integer ``div`` and every
per-iteration sum is an integer sum — commutative, associative,
partitioning-proof. The mass lost to floor() each iteration is
bounded by (edges + nodes) units (~1e-9 each) and is the price of
bit-exact replay; ranking ORDER is what the operator exists for.

Update rule per iteration (n = node count, d = damping_pct/100):

    contrib(u)  = Σ_{v→u, out(v)>0}  r(v) div out(v)
    dangling    = Σ_{out(v)=0} r(v)
    r'(u)       = (15·unit) div (100·n)                  [teleport]
                + (85 · (contrib(u) + dangling div n)) div 100

Scale shape (100 TB): each iteration is ONE shuffle join of the rank
table with the static edge table plus a key-grouped sum — the Pregel
pattern expressed relationally. The edge/degree frames are loop
invariants: callers running many iterations at scale should persist
them (and checkpoint ranks every few iterations to cut lineage); the
algebra here is deliberately lazy so the whole N-iteration plan is
one Catalyst tree at test scale. Hot (high in-degree) nodes are
plain aggregation skew — AQE handles them; there is no per-node
quadratic term anywhere.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no comparable operator (beyond-reference extension surface, same
category as SURVEY.md's dedup/similarity families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000  # rank fixed-point: 1.0 == 1e9 units


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 6,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    unit: int = UNIT,
) -> DataFrame:
    """Rank every node of the directed graph ``edges`` after a FIXED
    number of power iterations. Returns (node, rank) with integer
    ranks in ``1/unit`` units, starting from the uniform vector
    ``unit div n``. Duplicate edges are kept (a double link confers
    double weight — count-weighted adjacency); self-loops count like
    any other edge; nodes appearing only as destinations are dangling
    (no out-edges) and their mass teleports uniformly. Node ids must
    be castable to long and NON-NEGATIVE (-1 is reserved as the
    internal dangling sink).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    dp, un = int(damping_pct), int(unit)
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = nodes.join(deg, "node", "left").select(
        "node", F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg")
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("__n"))

    from pyspark.sql import Window

    r = base.crossJoin(F.broadcast(n_df)).select(
        "node", "out_deg", "__n",
        F.expr(f"cast({un} as bigint) div __n").alias("rank"),
    )
    # Lazy-plan discipline: each iteration references the PREVIOUS
    # rank frame exactly ONCE — a naive contrib-join + dangling-agg
    # + reassembly references it three times, and with lazy
    # composition the logical plan then grows as 3^iterations
    # (measured: multi-minute plan compilation at 6 iterations).
    # One LEFT join against the edge table routes every unit of mass:
    # matched rows carry rank div out_deg to their edge target,
    # unmatched rows (out_deg = 0) carry the full rank to the
    # sentinel node -1; one grouped sum then yields per-node incoming
    # mass AND the dangling total (the -1 row), and an empty-frame
    # window sum hands the dangling total to every row without a
    # second pass. The global window is a single-partition step over
    # the n-row RANK table (not the edges): fine far past dashboard
    # scale; at extreme node counts swap it for a checkpointed
    # broadcast scalar and persist ranks per iteration — the algebra
    # is unchanged.
    w_all = Window.partitionBy()
    for _ in range(iterations):
        routed = r.join(e, r["node"] == e["src"], "left").select(
            F.when(F.col("out_deg") > 0, F.col("dst"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("__to"),
            F.when(
                F.col("out_deg") > 0, F.expr("rank div out_deg")
            ).otherwise(F.col("rank")).cast("long").alias("__mass"),
        )
        inc = routed.groupBy(F.col("__to").alias("node")).agg(
            F.sum("__mass").cast("long").alias("__in")
        )
        r = (
            base.join(inc, "node", "full_outer")
            .withColumn(
                "__dang",
                F.coalesce(
                    F.sum(F.when(F.col("node") == -1, F.col("__in"))).over(w_all),
                    F.lit(0),
                ).cast("long"),
            )
            .where(F.col("node") != -1)
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
                "__n",
                (
                    F.expr(
                        f"({100 - dp} * cast({un} as bigint)) div (100 * __n)"
                    )
                    + F.expr(
                        f"({dp} * (coalesce(__in, cast(0 as bigint))"
                        " + (__dang div __n))) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return r.select("node", F.col("rank").cast("long").alias("rank"))
