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


def detect_skew(
    df: DataFrame,
    keys: list[str],
    sample_fraction: float = 0.01,
    seed: int = 42,
    top_n: int = 20,
    skew_ratio: float = 4.0,
) -> DataFrame:
    """Sample → hot-key report: estimate per-key row counts from a seeded
    sample and flag keys whose share exceeds ``skew_ratio``× the mean key
    load, with a suggested salt factor per hot key.

    Returns the ``top_n`` heaviest keys as
    ``(*keys, est_rows, share, mean_share, is_hot, suggested_salts)`` —
    a driver-sized frame (one action over a 1% sample, no full shuffle of
    the input: the sample is a narrow map-side filter and the groupBy
    shuffles only sampled rows).

    ``suggested_salts`` is ceil(share / mean_share) capped at 64 — enough
    splits to bring the hot key's per-task load back to the mean. Feed it
    to :func:`salted_join` / :func:`salted_aggregate`, or trust AQE's
    skew-join split when the skew is mild (this report is how you decide).
    """
    sampled = df.sample(fraction=sample_fraction, seed=seed)
    counts = sampled.groupBy(*keys).agg(F.count(F.lit(1)).alias("sample_rows"))
    totals = counts.agg(
        F.sum("sample_rows").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    est = F.col("sample_rows") / F.lit(sample_fraction)
    share = F.col("sample_rows") / F.col("total")
    mean_share = F.lit(1.0) / F.col("n_keys")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            est.cast("long").alias("est_rows"),
            share.alias("share"),
            mean_share.alias("mean_share"),
            (share > mean_share * F.lit(skew_ratio)).alias("is_hot"),
            F.least(
                F.ceil(share / mean_share).cast("int"), F.lit(64)
            ).alias("suggested_salts"),
        )
        .orderBy(F.col("est_rows").desc())
        .limit(top_n)
    )


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
