"""Vector math over ``array<float>`` embedding columns — pure built-in
column expressions (zip_with / aggregate fold), JVM-side, no UDF.

These power the similarity-search and embedding-dedup operators. At
100 TB the cosine itself is never the bottleneck — candidate
generation is — so the design splits "pairing strategy" (operators/
similarity.py: brute-force, LSH-bucketed) from "distance kernel"
(here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product folded to a double sum (sequential fold —
    deterministic summation order, oracle-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
