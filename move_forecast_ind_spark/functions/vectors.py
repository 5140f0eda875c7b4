"""Vector column expressions for similarity search (north star, BASELINE.json).

All JVM-side: ``zip_with`` + ``aggregate`` fold for the dot product —
verified bit-identical to DuckDB's ``list_inner_product`` on double-cast
lists (both fold left-to-right in IEEE double), so cosine queries can be
hash-checked by the oracle. No UDFs on the hot path.

Scale note: each expression is O(dim) per row inside whole-stage codegen;
a 64-dim cosine over 10^9 rows is a single map stage, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
