"""Connected components over a candidate-pair graph — the step that
turns pairwise near-dup hits (operators/dedup.py emits doc_a/doc_b
pairs) into per-document canonical assignments, which is what a
training-data pipeline actually consumes (keep one doc per duplicate
cluster, drop the rest).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14; public). Each round is two bounded shuffles
(groupBy-min + join); the edge set converges to a star forest (every
node points at its component minimum) in O(log n) rounds — unlike
plain label propagation, which needs O(diameter) rounds and dies on
long duplicate chains at 100 TB.

Scale notes:
- no ``collect()`` of edges or labels; the only driver-side values are
  the per-round convergence checksum (2 scalars).
- lazy ``localCheckpoint`` per round truncates the iterative join
  lineage — without it, round k re-executes rounds 1..k-1; the
  per-round checksum collect is the one action that materializes it
  (r13: formerly eager, i.e. a second job per round).
- worst case O(log n) rounds; near-dup graphs (small dense clusters)
  typically converge in 2-3.

The reference has no graph/clustering surface (its dedup story ends
at dropDuplicates, dags/2_bronze_to_silver.py:214); this module is
extension surface, exercised by the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped."""
    e = edges.where(F.col("u") != F.col("v"))
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u with neighborhood G(u): connect every neighbor
    v > u to m = min(G(u) + {u}). Operates on the symmetric adjacency."""
    nbr = _symmetrize(edges)
    mins = nbr.groupBy("u").agg(F.min("v").alias("_mv")).select(
        "u", F.least(F.col("_mv"), F.col("u")).alias("m")
    )
    return (
        nbr.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, then for each node u connect all
    smaller neighbors (and u itself) to m = min of that set."""
    e = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).where(F.col("u") != F.col("v")).distinct()
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        e.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return linked


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor fold: order-insensitive and overflow-free (ANSI-safe)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = min node id reachable — deterministic canonical labels.

    ``edges`` is an undirected pair list (duplicate/reversed rows fine).
    Raises if not converged within ``max_rounds`` (paper bound is
    O(log n); 20 covers any realistic graph).

    Node ids may be any orderable type (the algorithm needs only a
    total order for the min-label convention): integer ids are widened
    to long for a stable label type; string ids pass through and label
    by lexical minimum (r5 advice — the former unconditional
    ``cast("long")`` broke string doc ids under ANSI mode).
    """
    int_types = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(edges.dtypes)
    if dtypes[src] in int_types and dtypes[dst] in int_types:
        u, v = F.col(src).cast("long"), F.col(dst).cast("long")
    else:
        u, v = F.col(src), F.col(dst)
    e = (
        edges.select(u.alias("u"), v.alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        # ONE evaluation of the caller's edge plan (r10): both the
        # node universe and the iterated adjacency derive from this
        # checkpoint. Without it, `nodes` re-ran the whole upstream
        # pair plan at result time — for canonicalize that is the
        # full LSH-candidate + verification subtree, i.e. the
        # corpus-sized work, paid twice (measured: the second
        # evaluation was ~8 s of the 15 s components wall at sf0.01).
        # r13: LAZY — the round-1 checksum action materializes it (one
        # action instead of two); `nodes`, consumed at result time,
        # reads the already-materialized blocks exactly as before.
        .localCheckpoint(eager=False)
    )
    nodes = e.select(F.col("u").alias("node")).unionByName(
        e.select(F.col("v").alias("node"))
    ).distinct()

    # r13 (guide §1.2, fewer actions): the round checkpoints are LAZY —
    # each round's ONE action is the `_checksum` collect, which
    # materializes that round's checkpoint as a side effect (blocks
    # persist as the aggregate computes them). The former eager
    # checkpoints ran a separate materialization job per round before
    # the checksum job: 2 actions/round → 1, same lineage truncation
    # (round k still reads round k-1's materialized RDD, never
    # re-executes it).
    cur = _symmetrize(e).localCheckpoint(eager=False)
    prev_sig = None
    for _ in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # converged edge set is a star forest: (node → component min)
    stars = cur.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    return (
        nodes.join(stars, "node", "left")
        .select("node", F.least(F.coalesce("component", "node"), "node").alias("component"))
    )


def canonicalize(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Per-document canonical assignment from near-dup pairs: every doc
    gets (canonical_id, is_canonical); docs in no pair are their own
    canonical. Downstream keeps ``is_canonical`` rows only — the
    standard corpus-dedup contract."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.join(comp, docs[id_col] == comp["node"], "left")
        .select(
            docs["*"],
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    score: F.Column | None = None,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Quality-aware duplicate resolution: within each near-dup
    cluster keep the BEST document, not the min-id one. ``score`` is
    any column expression over ``docs`` (default:
    ``functions.text.quality_score`` on ``text``); ties break on the
    smaller id so the choice is deterministic. Output = ``docs``
    plus (cluster_id, keep) — downstream filters ``keep``.

    This is the curation-grade contract (min-id canonicalization can
    keep the truncated/mojibake copy of a page; scoring keeps the
    clean one). Plan: components (O(log n) rounds) + one max_by per
    cluster + one broadcast-friendly membership join — no window over
    the full corpus."""
    if score is None:
        from ..functions.text import quality_score

        score = quality_score(F.col("text"))
    comp = connected_components(pairs, src=src, dst=dst)
    labeled = (
        docs.join(comp, docs[id_col] == comp["node"], "left")
        .select(
            docs["*"],
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
            score.alias("__score"),
        )
    )
    # argmax per cluster: min_by over a (-score, id) struct — higher
    # score wins, smaller id wins ties; singleton clusters keep
    # themselves trivially. The id is NOT negated, so the tie-break is
    # type-agnostic (string doc ids order lexically; the former
    # -F.col(id) form assumed numeric ids and errored under ANSI mode
    # for strings). ``score`` itself must be numeric — it is negated.
    # NULL scores must LOSE: struct comparison sorts a null first
    # field smallest, so a bare -score would make the null-score doc
    # (exactly the corrupt copy this function exists to discard) win
    # under min_by — coalesce the negated score to +inf instead.
    sort_key = F.coalesce(-F.col("__score"), F.lit(float("inf")))
    best = (
        labeled.groupBy("cluster_id")
        .agg(
            F.min_by(
                F.col(id_col), F.struct(sort_key, F.col(id_col))
            ).alias("__best_id")
        )
    )
    return (
        labeled.join(best, "cluster_id")
        .withColumn("keep", F.col(id_col) == F.col("__best_id"))
        .drop("__score", "__best_id")
    )


def triangle_stats(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Exact triangle / wedge counts and the global clustering
    coefficient of the near-dup graph — the cluster-SHAPE diagnostic
    next to component sizes (a high coefficient means duplicates come
    in dense cliques that canonicalization collapses safely; a low
    one means long chains, where transitive dedup is aggressive —
    Newman 2003, "The structure and function of complex networks").

    Degree-oriented counting (Suri & Vassilvitskii 2011, "Counting
    Triangles and the Curse of the Last Reducer"): every undirected
    edge is oriented from its lower-(degree, id) endpoint to the
    higher one, wedges are enumerated ONLY from each node's oriented
    out-neighborhood (out-degree is O(sqrt(m)) on any graph, so the
    wedge set is O(m^1.5) instead of sum-of-squared-degrees — hub
    nodes no longer explode), and each triangle is counted exactly
    once at its (degree, id)-minimum corner. All integer arithmetic;
    the DuckDB replay uses the naive 3-way join over the canonical
    a<b edge set, proven equal to this oriented plan in
    tests/test_components.py.

    Returns ONE row: ``tri_edges``, ``tri_triangles``, ``tri_wedges``
    (open+closed, sum over nodes of d*(d-1)/2), and ``tri_gcc_grid``
    (3*triangles/wedges floor-snapped to the 1e-6 grid; 0 when the
    graph has no wedge).
    """
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # lineage cut: degrees, orientation and both wedge-side reads all
    # consume this frame — without the cut the caller's pair plan
    # (often an LSH or shingle join) re-executes per consumer
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w")
    )
    # orient by (degree, id): u -> v iff (d_u, u) < (d_v, v)
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("db"))
    ed = e.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=False)
    # wedges from each u's oriented out-neighborhood, ordered by the
    # SAME (degree, id) total order so the closing edge is oriented
    # x -> y exactly when (d_x, x) < (d_y, y)
    lo = oriented.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    hi = oriented.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    cand = lo.join(hi, "u").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri = cand.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    edges_n = e.agg(F.count(F.lit(1)).cast("long").alias("m"))
    return (
        tri.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(edges_n))
        .select(
            F.col("m").alias("tri_edges"),
            F.col("t").alias("tri_triangles"),
            F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("tri_wedges"),
            F.when(
                F.coalesce(F.col("w"), F.lit(0)) > 0,
                F.floor(
                    F.lit(3.0) * F.col("t") / F.col("w") * 1_000_000
                    + F.lit(0.5)
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("tri_gcc_grid"),
        )
    )


def kcore(
    pairs: DataFrame,
    iterations: int = 8,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Coreness of every node in the near-dup graph by iterated
    H-index (Lü, Chen, Ren, Zhang, Zhang, Zhou 2016, "The H-index of
    a network node and its relation to degree and coreness", Nature
    Communications — public): start from degree, then repeatedly
    replace each node's value with the H-index of its neighbors'
    values; the sequence is monotone non-increasing and converges to
    the k-core number. Coreness is the dedup-graph SPAM diagnostic
    the other graph stats miss: a high-coreness region is a dense
    template cluster (every member near-dups many others — mirror
    farms, boilerplate), while triangles/gcc only see local closure
    and components only see reachability.

    Determinism: the H-index of a value multiset is order-invariant,
    so a FIXED round count is bit-identical cross-engine and
    layout-proof whether or not the iteration has converged (the
    LPA/pr_* discipline; raise ``iterations`` for a fixpoint — the
    paper's convergence is O(graph diameter)-ish, single digits on
    near-dup graphs).

    Plan shape per round: ONE values⋈edges shuffle, then a groupBy
    whose per-node state is the degree-bounded sorted neighbor-value
    array; the H-index itself is a whole-stage-codegen array
    expression (``size(filter(sorted desc, x_i >= i+1))`` — the
    prefix-count form of max_i min(i, v_i)), no window, no Python.
    Per-round lazy localCheckpoint keeps the recurrence one linear
    plan. Hub nodes bound the array at their degree — the same
    envelope the LPA neighbor-count aggregation already carries.

    Returns (node, core).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = _symmetrize(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)
    cur = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("core")).select(
        F.col("u").alias("node"), "core"
    )
    for _ in range(iterations):
        nb = cur.join(e, cur["node"] == e["u"]).select(
            F.col("v").alias("n"), F.col("core").alias("val")
        )
        cur = (
            nb.groupBy(F.col("n").alias("node"))
            .agg(
                F.expr(
                    "size(filter(sort_array(collect_list(val), false),"
                    " (x, i) -> x >= i + 1))"
                ).cast("long").alias("core")
            )
            .localCheckpoint(eager=False)
        )
    return cur


def label_propagation(
    pairs: DataFrame,
    iterations: int = 4,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007, "Near linear time algorithm to detect community structures
    in large-scale networks") after a FIXED number of rounds — the
    community-structure diagnostic FINER than connected components
    (a chain of weak links is one component but several communities;
    mixture/curation reads both).

    Determinism: every node starts labeled with its own id; each
    round every node adopts the label most frequent among its
    neighbors, ties broken to the SMALLEST label (argmax by
    (count, -label) — an exact integer rule, so the fixed-round
    outcome is bit-identical cross-engine and layout-proof, unlike
    the randomized-order variant in the paper). Synchronous updates
    can oscillate on bipartite structures; with a fixed round count
    the result is still exact — callers wanting a fixpoint raise
    ``iterations``.

    Scale shape: per round ONE labels⋈edges shuffle + two bounded
    aggregations ((node, label) counts with map-side combine, then
    the per-node argmax); per-round lazy localCheckpoint keeps the
    recurrence one linear plan (the pagerank discipline). Returns
    (node, community).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = _symmetrize(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)
    labels = e.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iterations):
        counts = (
            labels.join(e, labels["node"] == e["u"])
            .groupBy(F.col("v").alias("n"), F.col("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        best = F.max(F.struct(F.col("c"), (-F.col("label")).alias("__n")))
        labels = (
            counts.groupBy(F.col("n").alias("node"))
            .agg((-best.getField("__n")).cast("long").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("label").alias("community"))
