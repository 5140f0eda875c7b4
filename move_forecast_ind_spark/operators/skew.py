"""Skew mitigation: salted joins (SCALE.md posture; SURVEY.md §2.3 note on
skewed keys).

AQE's skew-join split handles most skew automatically (enabled in
session.RUNTIME_CONF). Salting is for the cases AQE can't fix: a *single*
hot key whose rows exceed one task even after splitting, or skewed
aggregations. The pattern: add a deterministic salt ∈ [0, n) to the big
side's key, replicate the small side n× (one copy per salt value), join on
(key, salt). Shuffle load for the hot key spreads over n tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_source: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the big side salted.

    ``salt_source`` must be a column expression over ``big`` whose values
    spread rows of the same join key (any row-level column works, e.g. the
    line number or a hash of remaining columns); the salt is
    ``pmod(xxhash64(salt_source), n_salts)`` — deterministic, replayable.

    ``small`` is replicated ``n_salts``× via an explode — keep it the
    smaller input (cost = n · |small| shuffle rows).
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated_small, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_source: Column,
    aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (keys, salt) first — spreading the hot key across n tasks — then merge
    the partials on keys alone.

    ``aggs`` are the partial aggregates (aliased), ``merge_aggs`` the
    matching merge expressions over the partial columns (e.g. partial
    ``sum(x) AS s`` merges with ``sum(s) AS s``; ``count`` merges with
    ``sum``; ``avg`` must be decomposed into sum+count by the caller).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
