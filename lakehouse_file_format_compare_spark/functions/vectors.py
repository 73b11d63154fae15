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


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale, q) with
    scale = max|x| / 127 and q[i] = round(x[i] / scale). Cuts
    embedding storage 4x (the standard trick for 100 TB-scale vector
    corpora); dot products on q need one scale_a * scale_b fixup.
    Pure column math — transform + fold, no UDF."""
    mx = F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    return F.struct(
        scale.alias("scale"),
        F.transform(vec, lambda x: F.round(x.cast("double") / scale).cast("tinyint")).alias("q"),
    )


def dequantize_int8(qv: Column) -> Column:
    """Inverse of quantize_int8: array<float> with per-element error
    <= scale/2."""
    return F.transform(qv["q"], lambda q: (q.cast("double") * qv["scale"]).cast("float"))
