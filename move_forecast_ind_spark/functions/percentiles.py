"""Sort-based exact interpolated percentiles per group.

Spark's ``percentile`` aggregate is an ObjectHashAggregate that buffers
EVERY (value → count) pair per group in an in-memory map, merges the maps
across partials, then sorts the merged map — measured r14 at ~4 s of the
~4.2 s wall of ``a_trimmed_mean`` at sf0.1 (583 k distinct doubles per
group buffer), and at 100 TB the per-group buffer is an OOM/straggler
hazard (guide §5: prefer operators that spill).

This helper computes the SAME exact interpolated percentile with one
shuffle and a window sort — positional math over ``row_number``:

    pos   = p * (n - 1)                    (Percentile.getPercentile)
    lower = floor(pos), higher = ceil(pos)
    value = v[lower]                       if lower == higher
          = (higher-pos)*v[lower] + (pos-lower)*v[higher]   otherwise

which is Spark's own interpolation formula verbatim, evaluated in the same
double arithmetic — results are bit-identical to ``percentile(col, p)``
(pinned by ``tests/test_functions.py::test_group_percentiles_bit_identical``
across fixtures and an adversarial ties/odd/even synthetic). The window
sort spills through Spark's sort machinery instead of buffering a map,
and the shuffle carries only (keys, col).

Ties: duplicate values make ``row_number`` order within the tie arbitrary,
but every row in the tie carries the same value, so v[lower] / v[higher]
are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    ps: list[float],
    aliases: list[str] | None = None,
) -> DataFrame:
    """One row per group with a column per requested percentile of ``col``.

    NULLs in ``col`` are excluded, like the ``percentile`` aggregate.
    Groups whose every value is NULL are absent from the output (callers
    that need them should left-join back); the buffering aggregate returns
    NULL for those — every current caller filters or joins on the result,
    where absent and NULL behave identically.
    """
    aliases = aliases or [f"p_{i}" for i in range(len(ps))]
    val = df.filter(F.col(col).isNotNull()).select(*keys, col)
    # group sizes via a broadcast join-back rather than a second
    # (unordered) window pass — count().over(partitionBy) buffers every
    # partition a second time and measured SLOWER than the buffering
    # aggregate it replaces. Group cardinality is bounded for every
    # caller (grouping keys are categorical), so the count frame
    # broadcasts.
    counts = val.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    w_sort = Window.partitionBy(*keys).orderBy(col)
    rn = (F.row_number().over(w_sort) - F.lit(1)).alias("__rn")  # 0-based
    ranked = val.select(*keys, F.col(col).alias("__v"), rn).join(
        F.broadcast(counts), keys
    )
    # keep only the rows any percentile's interpolation touches
    keep = F.lit(False)
    for p in ps:
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1))
        keep = keep | (F.col("__rn") == F.floor(pos)) | (F.col("__rn") == F.ceil(pos))
    picked = ranked.filter(keep)
    aggs = []
    for p, alias in zip(ps, aliases):
        pos = F.lit(float(p)) * (F.col("__n") - F.lit(1))
        lo_i, hi_i = F.floor(pos), F.ceil(pos)
        v_lo = F.max(F.when(F.col("__rn") == lo_i, F.col("__v")))
        v_hi = F.max(F.when(F.col("__rn") == hi_i, F.col("__v")))
        # per-group scalars: pos/lo_i/hi_i depend only on __n, constant
        # within the group — min() collapses them losslessly
        pos_g = F.min(pos)
        lo_g = F.min(lo_i)
        hi_g = F.min(hi_i)
        aggs.append(
            F.when(lo_g == hi_g, v_lo)
            .otherwise((hi_g - pos_g) * v_lo + (pos_g - lo_g) * v_hi)
            .alias(alias)
        )
    return picked.groupBy(*keys).agg(*aggs)
