"""Cross-engine-deterministic numeric snapping.

``round(double, n)`` is NOT portable: Spark rounds the shortest
decimal representation (BigDecimal HALF_UP) while DuckDB/C rounds the
binary value, so .005-boundary addends diverge. ``grid`` snaps with
pure IEEE arithmetic — multiply, add 0.5, floor, divide — which every
engine executes bit-identically. All plan money/ratio outputs go
through this, and sums are taken over grid-snapped addends so the
result is invariant to summation order (error << half a grid step).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def grid(col: Column, dp: int = 2) -> Column:
    scale = 10 ** dp
    return F.floor(col * scale + F.lit(0.5)) / scale


def grid_sql(expr: str, dp: int = 2) -> str:
    scale = 10 ** dp
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
