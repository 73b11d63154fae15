"""Distribution statistics: exact and approximate percentiles.

Exact ``percentile`` is a full-sort-per-group aggregate — correct
but O(n log n) per group and memory-heavy at 100 TB. The serving
path is ``approx_percentile`` (Greenwald-Khanna sketch): one pass,
mergeable across partitions (map-side partial sketches), with a
declared accuracy dial. House rule for approximate operators: ship
both, pin the approx path against the exact one with a tolerance
contract (tests/test_stats.py, DuckDB cross-check for the exact
side — DuckDB ``quantile_cont`` uses linear interpolation while
Spark's exact ``percentile`` does too, so they agree bit-for-bit on
the 1e-6 grid).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .numeric import grid

DEFAULT_PROBS = (0.25, 0.5, 0.75, 0.95, 0.99)


def percentile_summary(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float] = DEFAULT_PROBS,
    group_cols: Sequence[str] = (),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """One row per group with a column per requested percentile
    (``p25``, ``p50``, …). ``exact=False`` switches to the
    Greenwald-Khanna sketch (rank error ≤ 1/accuracy) — the 100 TB
    path; the exact form is the verifier."""
    def name(p: float) -> str:
        s = f"{p * 100:g}".replace(".", "_")
        return f"p{s}"

    if exact:
        aggs = [
            grid(F.percentile(F.col(value_col), F.lit(p)), 6).alias(name(p))
            for p in probs
        ]
    else:
        aggs = [
            grid(
                F.approx_percentile(F.col(value_col), F.lit(p), F.lit(accuracy)), 6
            ).alias(name(p))
            for p in probs
        ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)
