"""The forecast request's relational tail as ONE Spark plan (SURVEY.md §3.1
steps 7-11).

After the model produces a per-day branch forecast, the reference does, PER
ROW of the ≤7-day window: a day-grain percentage lookup (1 Postgres
round-trip), a month-grain fallback lookup (another round-trip), a constant
fallback, scaling, banding, random phrase choice, and running totals —
up to ~30 fresh TCP connections per request (reference main.py:91-118,
239-332). Here the lookup table is joined wholesale:

    frame (≤7×branches rows)
      LEFT JOIN broadcast(pct)       ON (branch, move_type, month, day)   [J1]
      LEFT JOIN broadcast(month_pct) ON (branch, move_type, month)        [J2]
      pct_used = COALESCE(day, month, 1.0)                                 [J3]
      predicted = floor(pct_used/100 * forecast + 0.5)  clipped at 0       [F8-F10]
      band/comment via CASE + deterministic phrase pick                    [F12-F14]

Two broadcast joins replace ~30 point lookups; every fallback level is one
COALESCE argument. The phrase choice is the reference's random.choice
(main.py:270-315) made deterministic: index = (branch*31 + month*7 + day) % 3
— replayable and hash-checkable (SURVEY.md §5.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import r4, round_count, round_half_up

# Three-phrase banks per band (shape of reference main.py:130-163).
PHRASES: dict[str, tuple[str, str, str]] = {
    "stronger": (
        "demand is running ahead of the usual pace",
        "expect a busier day than the historical norm",
        "volumes trending above the seasonal average",
    ),
    "consistent": (
        "demand is in line with the usual pace",
        "expect a typical day for this season",
        "volumes tracking the seasonal average",
    ),
    "weaker": (
        "demand is running behind the usual pace",
        "expect a quieter day than the historical norm",
        "volumes trending below the seasonal average",
    ),
}


def phrase_pick(band: Column, idx: Column) -> Column:
    """Deterministic phrase selection: CASE over band × (idx % 3)."""
    expr = None
    for b, bank in PHRASES.items():
        pick = F.element_at(F.array(*[F.lit(p) for p in bank]), idx + 1)
        expr = F.when(band == b, pick) if expr is None else expr.when(band == b, pick)
    return expr


def forecast_tail(
    frame: DataFrame,  # branch, ds (date), move_type, branch_forecast (double)
    pct: DataFrame,  # plans.percentages.compute_percentages output
    month_pct: DataFrame,  # plans.percentages.month_grain_percentages output
) -> DataFrame:
    """Attach percentages, scale, band, and phrase — one plan, two broadcast
    joins, zero per-row work."""
    f = frame.select(
        "branch",
        "move_type",
        "ds",
        "branch_forecast",
        F.month("ds").alias("month"),
        F.dayofmonth("ds").alias("day"),
    )
    day_pct = F.broadcast(
        pct.select("branch", "move_type", "month", "day", "avg_percentage")
    )
    mon_pct = F.broadcast(month_pct)

    j = (
        f.join(day_pct, on=["branch", "move_type", "month", "day"], how="left")
        .join(mon_pct, on=["branch", "move_type", "month"], how="left")
    )
    # NULL move_type = the reference's silent demotion of an unknown type
    # (reference main.py:204-209): no percentage split, the full branch
    # forecast applies (100%). Otherwise: day → month → 1.0 fallback chain.
    pct_used = F.when(F.col("move_type").isNull(), F.lit(100.0)).otherwise(
        F.coalesce(
            F.col("avg_percentage"), F.col("month_avg_percentage"), F.lit(1.0)
        )
    )
    diff_pp = r4(
        F.when(
            F.col("avg_percentage").isNotNull()
            & F.col("month_avg_percentage").isNotNull(),
            F.col("avg_percentage") - F.col("month_avg_percentage"),
        ).otherwise(F.lit(0.0))
    )
    band = (
        F.when(F.abs(diff_pp) <= 5.0, "consistent")
        .when(diff_pp > 5.0, "stronger")
        .otherwise("weaker")
    )
    idx = F.pmod(
        F.col("branch") * 31 + F.col("month") * 7 + F.col("day"), F.lit(3)
    ).cast("int")
    predicted = round_count(
        F.greatest(pct_used / 100.0 * F.col("branch_forecast"), F.lit(0.0))
    )
    return j.select(
        "branch",
        "move_type",
        "ds",
        F.round(F.col("branch_forecast"), 2).alias("branch_forecast"),
        r4(pct_used).alias("pct_used"),
        predicted.alias("predicted_moves"),
        diff_pp.alias("diff_pp"),
        band.alias("band"),
        F.concat(
            phrase_pick(band, idx),
            F.lit(" ("),
            F.format_string("%.1f", round_half_up(pct_used, 1)),
            F.lit("% of branch volume)"),
        ).alias("comment"),
    )


def forecast_summary(tail: DataFrame) -> DataFrame:
    """Period roll-up (reference main.py:290-332): totals + average daily
    moves per (branch, move_type) over the window — a single aggregate over
    the ≤7-row-per-branch tail, not a second wave of lookups."""
    return (
        tail.groupBy("branch", "move_type")
        .agg(
            F.sum("predicted_moves").cast("long").alias("total_predicted_moves"),
            round_count(F.avg("predicted_moves")).alias("average_daily_moves"),
            r4(F.avg("pct_used")).alias("avg_pct_used"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("branch", "move_type")
    )
