"""Skew-handling join: explicit key salting for when AQE's runtime
skew-join splitting isn't enough (extreme hot keys, or a build side
too large to broadcast).

The reference only enables AQE skew handling
(spark.sql.adaptive.skewJoin.enabled, dags/3_silver_to_gold.py:57);
at 100 TB a single hot key (the classic null-key or default-value
skew) can exceed what AQE can subdivide. Salting rewrites

    big ⋈ small ON k      →      big(+salt rand(S)) ⋈ small(×S replicas) ON (k, salt)

spreading each hot key across S reducers at the cost of replicating
the small side S×. Correct for inner and left-outer joins (the salted
small side is a pure replication, so each big-side row still matches
exactly its original partners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Join ``big`` with ``small`` on column ``on`` with key salting.
    ``small`` is replicated ``salt_buckets`` times; ``big`` rows get a
    deterministic-per-row salt (xxhash64 of all columns, not rand(),
    so retries/speculative tasks stay consistent)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(seed)), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")
