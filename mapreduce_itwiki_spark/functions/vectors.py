"""Vector math over ``array<float>`` embedding columns — built-in
higher-order functions only (``zip_with``/``aggregate``), evaluated
JVM-side. Casting to double FIRST makes the arithmetic bit-compatible
with the DuckDB oracle's ``list_dot_product`` on ``DOUBLE[]``.

At 100 TB the brute-force cosine path is a single broadcast-join +
map stage (no shuffle); the LSH/IVF variants in operators/similarity.py
cut the candidate set before this math runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision dot product."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
