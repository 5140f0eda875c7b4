"""Deterministic, cross-engine-stable rounding helpers.

Why these exist: the correctness oracle hash-compares Spark output against
DuckDB byte-for-byte. Double aggregation order differs between engines (and
between runs under AQE), so raw SUM/AVG doubles differ in the last ulps; and
the engines' native ROUND functions disagree at midpoints (Spark ``round`` is
HALF_UP via Java BigDecimal, ``bround`` HALF_EVEN; DuckDB rounds through
``nearbyint`` on scaled doubles). The reference itself rounds with numpy /
Python (HALF_EVEN — reference main.py:236,255,290), a third behavior.

The portable fix: ``FLOOR(x * 10^s + 0.5) / 10^s``. Both engines evaluate
that expression in IEEE-754 double with correctly-rounded ops, so results are
bit-identical whenever the inputs agree to well under half an ulp of the
rounding grain — which post-aggregation doubles do. Every query that emits a
double uses these helpers on BOTH sides (Spark column + oracle SQL string).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(c: Column, scale: int = 2) -> Column:
    """Round half-up (toward +inf) at ``scale`` decimals, IEEE-stable."""
    p = float(10**scale)
    return F.floor(c * p + F.lit(0.5)) / F.lit(p)


def r2(c: Column) -> Column:
    return round_half_up(c, 2)


def r4(c: Column) -> Column:
    return round_half_up(c, 4)


def r6(c: Column) -> Column:
    return round_half_up(c, 6)


def sql_double(x: float) -> str:
    """Exact SQL DOUBLE literal for ``x``: repr round-trips the IEEE
    value; the E0 suffix is appended only when repr is fixed-notation
    (bare ``0.85`` parses as DECIMAL; exponent-form repr like ``1e-05``
    already IS a DOUBLE literal — suffixing it would be invalid SQL)."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "E0"


def sql_round_half_up(expr: str, scale: int = 2) -> str:
    """The SQL twin of :func:`round_half_up`, valid in BOTH DuckDB and Spark
    SQL. Uses exponent literals (``1e2``) because ``100.0`` parses as
    DECIMAL in Spark SQL (and DuckDB), which would silently switch the whole
    expression to decimal arithmetic and change the output type."""
    p = f"1e{scale}"
    return f"FLOOR(({expr}) * {p} + 0.5) / {p}"


def sql_r2(expr: str) -> str:
    return sql_round_half_up(expr, 2)


def sql_r4(expr: str) -> str:
    return sql_round_half_up(expr, 4)


def sql_r6(expr: str) -> str:
    return sql_round_half_up(expr, 6)


def round_count(c: Column) -> Column:
    """The reference's count rounding (reference main.py:236 ``.round().astype(int)``)
    re-expressed portably: half-up to integer, cast long. We standardize on
    half-up (see module docstring) and document the divergence from numpy's
    HALF_EVEN — at the midpoints it differs by 1 on odd integers only.
    """
    return F.floor(c + F.lit(0.5)).cast("long")


def sql_round_count(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) + 0.5) AS BIGINT)"
