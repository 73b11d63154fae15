"""Fuzzy string matching: edit-distance pair joins for entity
resolution (duplicate customer/supplier names, noisy IDs).

Two paths, the house pattern for approximate-by-blocking operators:

- ``edit_distance_pairs``: brute-force |L|x|R| levenshtein — the
  declared exact baseline and verifier (DuckDB has the same
  ``levenshtein``, so this has a full value oracle).
- ``edit_distance_pairs_blocked``: the scale path. Candidates must
  share at least one character bigram (plus a length band); survivors
  are re-verified with exact levenshtein, so precision is 1.0 by
  construction. The bigram block is EXACT (recall 1.0), not
  heuristic, for strings longer than 2k+1 chars: a string of length
  L contains L-1 overlapping bigrams and a single edit destroys at
  most 2 of them, so two strings within distance k share at least
  L-1-2k > 0 bigrams when L > 2k+1. Below that length the blocked
  path may miss pairs — callers with very short keys use the
  baseline (tiny anyway at those lengths). Cost ∝ Σ bucket² over
  bigram buckets.
- ``edit_distance_pairs_passjoin``: segment blocking (PassJoin),
  exact at EVERY length (no 2k+1 floor) and far fewer candidates
  than bigram blocking on diverse strings (k+1 segment buckets per
  row vs L-1 bigram buckets).

HONEST LIMIT (measured r4): on uniform-ID corpora ('Customer#00…',
15k rows) BOTH blockings degenerate — the constant prefix fills one
segment/bigram bucket with the whole table, and pairs whose edits
all fall in the suffix are found ONLY via that hot bucket, so no
exact signature scheme can cap it without losing exactly those
pairs. Measured: PassJoin exact-equal to brute force through ~500
such rows; beyond that, treat structured IDs with domain keys
(split the numeric tail into its own column) instead of generic
edit distance.

``edit_distance_pairs_structured`` (r5) ships that mitigation as
code: the caller names the structural prefix with a regex; for every
pair of distinct captured prefixes (equal pairs included) the
operator strips their longest common prefix and PassJoin-blocks on
the REDUCED strings. Exactness rests on the standard common-prefix
lemma for unit-cost Levenshtein — lev(c·u, c·v) = lev(u, v) (strip
one shared leading char at a time: the DP matrix is diagonally
monotone, D[i+1][j+1] >= D[i][j], so matching equal chars is always
optimal) — which makes reduced-string blocking recall-exact within
each prefix combo. Non-matching rows are handled by an explicit
bounded residual join (see the function docstring for the cost
model).

Both sides lowercase before comparison (matching the dedup family's
normalization). The bigram explode is bounded: L-1 rows per string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.lower(F.trim(col))


def edit_distance_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    left_col: str = "name",
    right_id: str = "id_b",
    right_col: str = "name",
    max_distance: int = 2,
) -> DataFrame:
    """Exact baseline: all pairs with levenshtein(a, b) <= k.
    O(|L|·|R|) — verifier and small-side path. The left side is
    repartitioned to the session's default parallelism first: a
    CartesianProduct's task count is nL×nR partitions, and a
    single-file parquet scan arrives as ONE partition — without the
    repartition the entire |L|·|R| levenshtein sweep runs as a single
    task (measured: 15k×15k = 225M pairs never finished on one core;
    seconds across 32)."""
    par = left.sparkSession.sparkContext.defaultParallelism
    a = left.select(F.col(left_id).alias("id_a"), _norm(F.col(left_col)).alias("sa")).repartition(par)
    b = right.select(F.col(right_id).alias("id_b"), _norm(F.col(right_col)).alias("sb"))
    return (
        a.crossJoin(b)
        .withColumn("distance", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def _bigrams(s):
    """All overlapping character bigrams of a normalized string."""
    return F.when(
        F.length(s) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 1),
                lambda i: s.substr(i, F.lit(2)),
            )
        ),
    ).otherwise(F.array(s))


def edit_distance_pairs_blocked(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    left_col: str = "name",
    right_id: str = "id_b",
    right_col: str = "name",
    max_distance: int = 2,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Scale path: bigram-block candidates (shared bigram + length
    band), exact levenshtein verify. Recall 1.0 for strings longer
    than 2·max_distance+1 (pigeonhole, see module docstring);
    precision 1.0 always. Hot bigram buckets (e.g. a constant prefix
    shared by every row) can be capped, but the cap TRADES RECALL:
    recall 1.0 is only guaranteed with ``max_bucket_size=None`` — a
    true pair whose L-1-2k guaranteed shared bigrams are ALL hot
    (highly repetitive text) loses every blocking bigram under the
    default cap and is silently missed even above the length bound.
    Callers needing guaranteed recall pass None (or use the PassJoin /
    structured paths)."""
    a = left.select(F.col(left_id).alias("id_a"), _norm(F.col(left_col)).alias("sa"))
    b = right.select(F.col(right_id).alias("id_b"), _norm(F.col(right_col)).alias("sb"))
    ea = a.select("id_a", "sa", F.explode(_bigrams(F.col("sa"))).alias("bg"))
    eb = b.select("id_b", "sb", F.explode(_bigrams(F.col("sb"))).alias("bg"))
    if max_bucket_size is not None:
        counts = (
            ea.select("bg").union(eb.select("bg"))
            .groupBy("bg").agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_bucket_size)
            .select("bg")
        )
        ea = ea.join(counts, "bg")
        eb = eb.join(counts, "bg")
    cand = (
        ea.join(eb, "bg")
        .where(F.abs(F.length("sa") - F.length("sb")) <= max_distance)
        .select("id_a", "sa", "id_b", "sb")
        .distinct()
    )
    return (
        cand.withColumn("distance", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def _passjoin_layouts(lengths: list[int], k: int) -> list[tuple[int, int, int, int]]:
    """PassJoin segment layouts: for each left-string length l, the
    k+1 (segment_idx, start, seg_len) partitions (Li/Deng/Feng 2011).
    l = q(k+1) + r -> r segments of length q+1 first, then k+1-r of
    length q. Returns rows (l, seg_idx, start_1based, seg_len)."""
    rows = []
    for ln in lengths:
        q, r = divmod(ln, k + 1)
        start = 1
        for i in range(k + 1):
            seg_len = q + 1 if i < r else q
            if seg_len <= 0:
                continue
            rows.append((ln, i, start, seg_len))
            start += seg_len
    return rows


def edit_distance_pairs_passjoin(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    left_col: str = "name",
    right_id: str = "id_b",
    right_col: str = "name",
    max_distance: int = 2,
) -> DataFrame:
    """Segment-blocked edit-distance join (PassJoin, Li/Deng/Feng
    2011): split each left string into k+1 disjoint segments; any
    right string within edit distance k must contain at least one
    segment VERBATIM, shifted by at most k positions. Block on
    (left_length, segment_idx, segment_text) with the right side
    enumerating substrings at the compatible positions. Exact: recall
    1.0 for ALL lengths (no length floor, unlike the bigram block —
    lengths <= k route through a bounded short×short join) and
    precision 1.0 via levenshtein re-verify. Candidate volume is
    Σ bucket² over segment buckets — k+1 buckets per row (vs L-1 for
    bigrams), so far fewer candidates on diverse strings; see the
    module docstring for the measured uniform-ID degenerate regime
    that no exact signature blocking escapes.

    The segment-layout dimension is built driver-side from the
    DISTINCT LEFT STRING LENGTHS (one bounded collect — at most
    max-length rows, the same bounded-metadata class as the IVF
    training sample) and broadcast. Right-side enumeration is
    ≤ (2k+1)·(k+1) substrings per row — a constant-factor explode,
    never |L|·|R|.
    """
    k = max_distance
    a = left.select(F.col(left_id).alias("id_a"), _norm(F.col(left_col)).alias("sa"))
    b = right.select(F.col(right_id).alias("id_b"), _norm(F.col(right_col)).alias("sb"))

    # Pigeonhole needs k+1 NON-EMPTY segments, so strings of length
    # <= k can have every segment touched by an edit — route them
    # through a direct short×short join instead (left len <= k can
    # only match right len <= 2k; both sides are the tiny-length
    # sliver of the data, so this stays bounded).
    short_pairs = (
        a.where(F.length("sa") <= k)
        .join(b.where(F.length("sb") <= 2 * k), F.lit(True))
        .withColumn("distance", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("distance") <= k)
        .select("id_a", "id_b", "distance")
    )
    a = a.where(F.length("sa") > k)

    lengths = [
        r["l"] for r in a.select(F.length("sa").alias("l")).distinct().collect()
    ]
    if not lengths:
        return short_pairs
    layouts = _passjoin_layouts(lengths, k)
    spark = left.sparkSession
    layout_df = spark.createDataFrame(
        layouts, "l int, seg_idx int, start int, seg_len int"
    )

    ea = (
        a.withColumn("l", F.length("sa"))
        .join(F.broadcast(layout_df), "l")
        .select(
            "id_a", "sa", "l", "seg_idx",
            F.col("sa").substr(F.col("start"), F.col("seg_len")).alias("seg_text"),
        )
    )
    # right side: for each compatible left length l and segment, try
    # every start within ±k of the segment's nominal position
    eb = (
        b.withColumn("m", F.length("sb"))
        .join(
            F.broadcast(layout_df),
            (F.col("l") >= F.col("m") - k) & (F.col("l") <= F.col("m") + k),
        )
        .select(
            "id_b", "sb", "l", "seg_idx", "seg_len",
            # guard empty windows: Spark's sequence(start, stop) steps
            # -1 when start > stop, which would emit positions OUTSIDE
            # [start-k, start+k] (junk candidates; correctness was
            # saved only by the levenshtein re-verify). Emit zero rows
            # instead.
            F.explode(
                F.when(
                    F.greatest(F.col("start") - k, F.lit(1))
                    <= F.least(F.col("start") + k, F.col("m") - F.col("seg_len") + 1),
                    F.sequence(
                        F.greatest(F.col("start") - k, F.lit(1)),
                        F.least(F.col("start") + k, F.col("m") - F.col("seg_len") + 1),
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("p"),
        )
        .where(F.col("p") >= 1)
        .select(
            "id_b", "sb", "l", "seg_idx",
            F.col("sb").substr(F.col("p"), F.col("seg_len")).alias("seg_text"),
        )
        .distinct()
    )
    cand = (
        ea.join(eb, ["l", "seg_idx", "seg_text"])
        .select("id_a", "sa", "id_b", "sb")
        .distinct()
    )
    long_pairs = (
        cand.withColumn("distance", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("distance") <= k)
        .select("id_a", "id_b", "distance")
    )
    return long_pairs.unionByName(short_pairs)


def edit_distance_pairs_structured(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id_a",
    left_col: str = "name",
    right_id: str = "id_b",
    right_col: str = "name",
    max_distance: int = 2,
    prefix_re: str = r"^([a-z]+#0*)",
    max_prefixes: int = 128,
) -> DataFrame:
    """Edit-distance join for STRUCTURED keys (constant prefix +
    variable tail, e.g. ``Customer#000000042``) — the domain-key
    mitigation for the uniform-ID regime where generic signature
    blocking provably degenerates (module docstring).

    ``prefix_re`` is an anchored regex whose group 1 captures the
    structural LOW-ENTROPY prefix of the NORMALIZED (lowercased,
    trimmed) string; the tail is everything after it. Capture ALL the
    constant structure — for zero-padded serials that includes the
    zero run (``^(customer#0*)``), otherwise the padding re-creates a
    constant leading segment inside the tails and the hot bucket
    returns. Exact decomposition of the result set lev(sa, sb) <= k:

    - **prefix-pair PassJoin** (the bulk): distinct prefixes are
      enumerated driver-side (ONE bounded collect, capped at
      ``max_prefixes`` — structural prefixes are low-cardinality by
      the operator's premise; a cap trip raises with advice rather
      than degrading). For EVERY ordered prefix combo (p, q) — p = q
      included — both full strings start with c = lcp(p, q), and the
      common-prefix lemma gives lev(sa, sb) = lev(sa[|c|:], sb[|c|:]),
      so PassJoin segment blocking runs on the REDUCED strings
      (p-remainder·tail vs q-remainder·tail) with (p, q) as extra
      equi-join keys. The reduced strings are exactly the
      high-entropy part of the key, so segment buckets stay small.
      Cost: Σ over combos of Σ bucket²; the prefix-pair table
      (|P|² rows) is broadcast, each input row fans out |P| ways.
    - **residual rows** (regex non-match, or a match whose capture is
      not actually a string prefix): brute-joined against both sides
      — exact, cost |R|·(|L|+|R|); callers pick a ``prefix_re`` that
      leaves the residual tiny.

    Precision 1.0 everywhere (every candidate re-verified with
    levenshtein on the FULL normalized strings); recall 1.0 because
    every pair is either residual-covered or falls in exactly one
    (p, q) combo whose reduced-string PassJoin is recall-exact (each
    short reduced string routes through the bounded short-path join).
    Output == ``edit_distance_pairs`` on ANY input — proven in tests
    including the full 15k 'Customer#…' sf0.1 corpus that generic
    PassJoin cannot finish (tests/test_fuzzy.py)."""
    k = max_distance

    # An unanchored regex could match mid-string, making the captured
    # group NOT a prefix and silently breaking the lemma — demote any
    # such row to the (exact) residual path instead.
    def _pfx(s):
        ext = F.regexp_extract(s, prefix_re, 1)
        return F.when(s.startswith(ext), ext).otherwise(F.lit(""))

    a = (
        left.select(F.col(left_id).alias("id_a"), _norm(F.col(left_col)).alias("sa"))
        .withColumn("pfx", _pfx(F.col("sa")))
        .withColumn("ta", F.expr("substring(sa, length(pfx) + 1)"))
    )
    b = (
        right.select(F.col(right_id).alias("id_b"), _norm(F.col(right_col)).alias("sb"))
        .withColumn("pfx", _pfx(F.col("sb")))
        .withColumn("tb", F.expr("substring(sb, length(pfx) + 1)"))
    )
    ma, ra = a.where(F.col("pfx") != ""), a.where(F.col("pfx") == "")
    mb, rb = b.where(F.col("pfx") != ""), b.where(F.col("pfx") == "")

    def verified(pairs: DataFrame) -> DataFrame:
        return (
            pairs.withColumn("distance", F.levenshtein(F.col("sa"), F.col("sb")))
            .where(F.col("distance") <= k)
            .select("id_a", "id_b", "distance")
        )

    # residual × everything (and everything × residual, counted once).
    # The crossJoin left sides are repartitioned to the session's
    # default parallelism — same single-partition-Cartesian guard as
    # edit_distance_pairs: a single-file parquet side arrives as ONE
    # partition and CartesianProduct task count is nL×nR, so a sizable
    # residual would otherwise run its whole levenshtein sweep as one
    # task.
    par = left.sparkSession.sparkContext.defaultParallelism
    out = verified(
        ra.select("id_a", "sa").repartition(par).crossJoin(b.select("id_b", "sb"))
    )
    out = out.unionByName(
        verified(
            ma.select("id_a", "sa").repartition(par).crossJoin(rb.select("id_b", "sb"))
        )
    )

    prefixes = sorted(
        r["pfx"]
        for r in ma.select("pfx").union(mb.select("pfx")).distinct().collect()
    )
    if not prefixes:
        return out
    if len(prefixes) > max_prefixes:
        raise ValueError(
            f"{len(prefixes)} distinct prefixes exceed max_prefixes="
            f"{max_prefixes}: prefix_re={prefix_re!r} captures high-entropy "
            "text, which defeats the structured decomposition (each row "
            "fans out |prefixes| ways). Tighten the regex or use "
            "edit_distance_pairs_passjoin."
        )

    def _lcp(p: str, q: str) -> int:
        n = 0
        for x, y in zip(p, q):
            if x != y:
                break
            n += 1
        return n

    spark = left.sparkSession
    # |P|² combos with the prefix remainders after stripping lcp(p, q);
    # a true pair (prefix p on the left, q on the right) is generated
    # by exactly one combo, so no cross-combo duplicates.
    pair_df = spark.createDataFrame(
        [
            (p, q, p[_lcp(p, q):], q[_lcp(p, q):])
            for p in prefixes
            for q in prefixes
        ],
        "pa string, qb string, rem_a string, rem_b string",
    )
    ea0 = (
        ma.join(F.broadcast(pair_df), ma["pfx"] == pair_df["pa"])
        .withColumn("va", F.concat(F.col("rem_a"), F.col("ta")))
        .select("id_a", "sa", "pa", "qb", "va")
    )
    eb0 = (
        mb.join(F.broadcast(pair_df), mb["pfx"] == pair_df["qb"])
        .withColumn("vb", F.concat(F.col("rem_b"), F.col("tb")))
        .select("id_b", "sb", "pa", "qb", "vb")
    )

    # short reduced strings (len <= k): pigeonhole inapplicable — pair
    # directly within the combo (the short sliver of each group × its
    # length-banded counterpart; bounded).
    short = (
        ea0.where(F.length("va") <= k)
        .join(eb0.where(F.length("vb") <= 2 * k), ["pa", "qb"])
    )
    out = out.unionByName(verified(short.select("id_a", "sa", "id_b", "sb")))

    la = ea0.where(F.length("va") > k)
    lengths = [
        r["l"] for r in la.select(F.length("va").alias("l")).distinct().collect()
    ]
    if not lengths:
        return out
    layout_df = spark.createDataFrame(
        _passjoin_layouts(lengths, k), "l int, seg_idx int, start int, seg_len int"
    )
    ea = (
        la.withColumn("l", F.length("va"))
        .join(F.broadcast(layout_df), "l")
        .select(
            "id_a", "sa", "pa", "qb", "l", "seg_idx",
            F.col("va").substr(F.col("start"), F.col("seg_len")).alias("seg_text"),
        )
    )
    eb = (
        eb0.withColumn("m", F.length("vb"))
        .join(
            F.broadcast(layout_df),
            (F.col("l") >= F.col("m") - k) & (F.col("l") <= F.col("m") + k),
        )
        .select(
            "id_b", "sb", "vb", "pa", "qb", "l", "seg_idx", "seg_len",
            F.explode(
                F.when(
                    F.greatest(F.col("start") - k, F.lit(1))
                    <= F.least(F.col("start") + k, F.col("m") - F.col("seg_len") + 1),
                    F.sequence(
                        F.greatest(F.col("start") - k, F.lit(1)),
                        F.least(F.col("start") + k, F.col("m") - F.col("seg_len") + 1),
                    ),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("p"),
        )
        .where(F.col("p") >= 1)
        .select(
            "id_b", "sb", "pa", "qb", "l", "seg_idx",
            F.col("vb").substr(F.col("p"), F.col("seg_len")).alias("seg_text"),
        )
        .distinct()
    )
    cand = (
        ea.join(eb, ["pa", "qb", "l", "seg_idx", "seg_text"])
        .select("id_a", "sa", "id_b", "sb")
        .distinct()
    )
    return out.unionByName(verified(cand))
