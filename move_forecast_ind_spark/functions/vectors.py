"""Vector column expressions for similarity search (north star, BASELINE.json).

All JVM-side: ``zip_with`` + ``aggregate`` fold for the dot product —
verified bit-identical to DuckDB's ``list_inner_product`` on double-cast
lists (both fold left-to-right in IEEE double), so cosine queries can be
hash-checked by the oracle. No UDFs on the hot path.

Construction cost (round-9 pass): each Column-lambda HOF costs dozens of
Py4J gateway roundtrips, and cosine composes three of them — so every
helper also accepts a plain SQL snippet (column name or expression STRING)
and then builds ONE ``F.expr`` string per call. The parsed Catalyst trees
are identical (``0D`` is the double literal F.lit(0.0) produced; the
lambdas are the same), so plans, results and oracles are unchanged. Pass
strings at hot call sites; Columns keep working everywhere else.

Scale note: each expression is O(dim) per row inside whole-stage codegen;
a 64-dim cosine over 10^9 rows is a single map stage, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def sql_dot(a: str, b: str) -> str:
    """Expr-string twin of :func:`dot` (valid Spark SQL)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, "
        "(acc, x) -> acc + x)"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"{sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)})"


def dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(sql_dot(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(sql_norm(a))
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(sql_cosine(a, b))
    return dot(a, b) / (norm(a) * norm(b))
