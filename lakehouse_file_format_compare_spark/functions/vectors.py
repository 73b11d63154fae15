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


def dot_literal(vec: Column, weights: list[float]) -> Column:
    """Dot product against a CONSTANT vector as a flat unrolled
    expression (element_at with literal indices + chained adds).
    Stays in whole-stage codegen, unlike higher-order-function folds
    which are interpreted per element — use this for hyperplane/
    centroid scoring where one side is a literal."""
    terms = [
        F.element_at(vec, i + 1).cast("double") * float(w)
        for i, w in enumerate(weights)
        if w != 0.0
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
