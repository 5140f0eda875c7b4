"""Z-order (Morton) curve key for multi-dimensional data layout.

The S9 "index analog" for lake tables: sorting a write by the interleaved
bits of two scan keys clusters BOTH dimensions into each parquet row
group, so min/max row-group statistics prune selective filters on EITHER
key — the standard OPTIMIZE ZORDER BY technique, expressed as a pure
column expression (no UDF, whole-stage codegen'd, engine-portable).

Construction: each key is clamped to ``bits`` (21 by default — two 21-bit
keys fill 42 bits of a positive BIGINT) and bit i of each input lands at
output bit 2i (+1 for the second key). The expression is a sum of
shift/mask terms, which both Spark and DuckDB evaluate identically on
BIGINTs — see the oracle replica in queries/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Z_BITS = 21


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave two non-negative integer columns into one BIGINT
    sort key (bit i of ``a`` → bit 2i; bit i of ``b`` → bit 2i+1). Values
    are masked to ``bits`` low bits first, so oversized keys wrap rather
    than overflow the sign bit."""
    mask = (1 << bits) - 1
    aa = a.cast("long").bitwiseAND(F.lit(mask))
    bb = b.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(aa, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def z_value_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The identical expression as engine-portable SQL text (DuckDB oracle
    twin of :func:`z_value`)."""
    mask = (1 << bits) - 1
    parts = []
    for i in range(bits):
        parts.append(f"((({a} & {mask}) >> {i} & 1) << {2 * i})")
        parts.append(f"((({b} & {mask}) >> {i} & 1) << {2 * i + 1})")
    return " + ".join(parts)
