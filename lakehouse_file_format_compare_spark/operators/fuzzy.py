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
  bigram buckets, never |L|x|R|.

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
    O(|L|·|R|) — verifier and small-side path."""
    a = left.select(F.col(left_id).alias("id_a"), _norm(F.col(left_col)).alias("sa"))
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
    shared by every row) can be capped — with the cap the remaining
    bigrams still block correctly when L-1-2k exceeds the number of
    capped buckets a pair relies on; the default cap only drops
    pathological single-bigram-only matches."""
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
