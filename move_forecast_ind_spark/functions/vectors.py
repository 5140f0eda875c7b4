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


def sql_dot_unrolled(a: str, b: str, d: int) -> str:
    """:func:`sql_dot` with the fold unrolled over a STATIC dimension
    ``d`` — ``a[1]*b[1] + a[2]*b[2] + …`` via element_at. The aggregate
    form runs in the expression INTERPRETER (no whole-stage codegen for
    lambda functions — measured r14 on the semdedup pair stage, ~1.5 M
    32-dim dots on one task: the interpreted fold was the stage).
    Addition is left-associated in the same element order as the fold
    (``(((x1y1)+x2y2)+…)`` vs ``(((0+x1y1)+x2y2)+…)`` — adding 0D to a
    finite double is exact), so the sum is bit-identical to
    :func:`sql_dot` for the same inputs."""
    terms = " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})"
        for i in range(1, d + 1)
    )
    # parenthesized: callers splice this into larger expressions
    # (e.g. `<dot> / (na * nb)`) where an unwrapped sum would bind wrong
    return f"({terms})"


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
