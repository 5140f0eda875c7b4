"""The reference's two service endpoints, end-to-end (SURVEY.md §3.1/§3.2).

`forecast_request` is the full POST /forecast/ path (reference
main.py:187-338) and `trends_request` the full POST /historical_trends/
(main.py:340-403) — each as ONE Spark job over the lake instead of ~30
(resp. 6) Postgres round-trips, with the clock injected (no hidden
``datetime.now()``, SURVEY §5.4) and every validation rule preserved:

1. strict date parse (400 on bad format)            main.py:190-193
2. horizon cap                                      main.py:196-197
3. branch must exist in the model registry          main.py:200-201
4. unknown move_type silently demoted to None       main.py:204-209
5. 7-day window clamp into [today, max]             main.py:215-228
6. per-day forecast → pct fallback chain → comment  main.py:230-288
7. period summary + average daily moves             main.py:290-332

Output is the nested response DataFrame; ``.toJSON()`` on it yields the
API-boundary JSON (S7).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetime_fns import forecast_window
from .forecast_tail import forecast_summary, forecast_tail
from .percentages import month_grain_percentages
from .training import score


class RequestError(ValueError):
    """Invalid request (the reference's HTTP 400 path, main.py:425-427)."""


def _parse_date(s: str) -> dt.date:
    try:
        return dt.datetime.strptime(s, "%Y-%m-%d").date()
    except ValueError as e:
        raise RequestError(f"date must be YYYY-MM-DD, got {s!r}") from e


def forecast_request(
    spark: SparkSession,
    models: DataFrame,  # plans.training registry (branch, coeffs, sigma, n_obs)
    pct: DataFrame,  # plans.percentages.compute_percentages output
    date: str,
    branch: int,
    move_type: str | None,
    today: dt.date,
    max_date: dt.date,
) -> tuple[DataFrame, DataFrame]:
    """Full forecast request → (daily rows, summary rows).

    Validation mirrors the reference exactly; the compute is: clamp window →
    score the branch's model over the date spine → tail (two broadcast
    joins + fallback chain + banding + phrases) → summary aggregate.
    """
    input_date = _parse_date(date)
    if input_date > max_date:
        raise RequestError(f"forecasts are capped at {max_date}")  # main.py:196-197

    # branch ∈ registry (main.py:200-201) — driver-side probe on the tiny
    # registry table, same semantics as the reference's model_cache check.
    if models.filter(F.col("branch") == branch).isEmpty():
        raise RequestError(f"unknown branch {branch!r}")

    # unknown move_type → None (100 %), the silent demotion (main.py:204-209)
    if move_type is not None:
        unknown = (
            pct.select("move_type")
            .filter(F.col("move_type") == move_type)
            .limit(1)
            .isEmpty()
        )
        if unknown:
            move_type = None

    start, end = forecast_window(input_date, today, max_date)
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("ds")
    ).withColumn("branch", F.lit(branch).cast("long"))

    scored = score(models.filter(F.col("branch") == branch), spine)
    frame = scored.select(
        "branch",
        F.lit(move_type).cast("string").alias("move_type"),
        # The scaling percentage resolves at the REQUEST's input date, even
        # when the window was clamped to start later (main.py:239-243).
        F.lit(str(input_date)).cast("date").alias("input_date"),
        "ds",
        # The reference clips and half-up-rounds the upper bound to an
        # integer Count BEFORE any scaling (main.py:234-236: clip(0).
        # round().astype(int)); final = round(pct/100 * Count) and
        # implied% = final/Count — so the tail must see the integer, not
        # the raw yhat_upper (score() computes it as `count`). Feeding the
        # fractional bound shifts predicted_moves by ±1 and can flip the
        # ±5pp comment band.
        F.col("count").cast("double").alias("branch_forecast"),
    )
    mon = month_grain_percentages(pct)
    daily = forecast_tail(frame, pct, mon)
    return daily, forecast_summary(daily)


def forecast_response(daily: DataFrame, summary: DataFrame) -> DataFrame:
    """S7: one nested row — the API response shape (main.py:321-332)."""
    days = daily.select(
        "branch",
        "move_type",
        F.struct(
            F.date_format("ds", "yyyy-MM-dd").alias("date"),
            F.col("predicted_moves").alias("count"),
            F.col("comment"),
        ).alias("day"),
    ).groupBy("branch", "move_type").agg(
        F.array_sort(F.collect_list("day")).alias("daily_forecast")
    )
    return (
        summary.join(days, on=["branch", "move_type"])
        .select(
            "branch",
            "move_type",
            "daily_forecast",
            F.struct(
                "total_predicted_moves", "average_daily_moves", "avg_pct_used", "n_days"
            ).alias("summary"),
        )
    )


def trends_request(
    spark: SparkSession,
    facts: DataFrame,
    branch_col: str,
    date_col: str,
    count_col: str,
    date: str,
    branch,
    move_type,
    type_col: str | None,
    today: dt.date,
    max_date: dt.date,
    years: tuple[int, int],
) -> DataFrame:
    """Full historical-trends request: same clamp, then the one-pass
    per-year aggregate + nested shaping (vs. 6 sequential round-trips)."""
    from .trends import historical_trends, trends_nested

    input_date = _parse_date(date)
    start, end = forecast_window(input_date, today, max_date)
    trends = historical_trends(
        facts,
        branch_col=branch_col,
        date_col=date_col,
        count_col=count_col,
        branch=branch,
        window_start=start,
        window_end=end,
        years=years,
        type_col=type_col if move_type is not None else None,
        move_type=move_type,
    )
    return trends_nested(trends)


def forecast_batch(
    spark: SparkSession,
    models: DataFrame,
    pct: DataFrame,
    requests: DataFrame,  # (branch long, move_type string|null, input_date date)
    today: dt.date,
    max_date: dt.date,
) -> DataFrame:
    """MANY forecast requests as ONE Spark job — the serving-layer scale
    story. The reference handles one request per HTTP call with ~30 DB
    round-trips each; here a whole batch plans together:

    requests → per-row window clamp (column expressions) → explode each
    window into its date spine → semi-join the registry (drops unknown
    branches, the reference's 400 path) → score → tail. Cost is one plan
    regardless of batch size.
    """
    from pyspark.sql import functions as F

    from ..functions.datetime_fns import forecast_window_cols
    from .percentages import month_grain_percentages

    t = F.lit(str(today)).cast("date")
    m = F.lit(str(max_date)).cast("date")

    # The silent unknown-move_type demotion (main.py:204-209), batched: a
    # type absent from the percentage table becomes NULL => the 100% path.
    known_types = pct.select("move_type").distinct().alias("k")
    requests = (
        requests.alias("q")
        .join(
            F.broadcast(known_types),
            F.col("q.move_type") == F.col("k.move_type"),
            "left",
        )
        .select(
            F.col("q.branch").alias("branch"),
            F.when(F.col("k.move_type").isNotNull(), F.col("q.move_type"))
            .otherwise(F.lit(None).cast("string"))
            .alias("move_type"),
            F.col("q.input_date").alias("input_date"),
        )
    )

    start, end = forecast_window_cols(F.col("input_date"), t, m)
    windows = requests.filter(F.col("input_date") <= m).select(
        "branch",
        "move_type",
        "input_date",
        start.alias("w_start"),
        end.alias("w_end"),
    )
    spine = windows.select(
        "branch",
        "move_type",
        "input_date",
        F.explode(
            F.sequence(F.col("w_start"), F.col("w_end"), F.expr("interval 1 day"))
        ).alias("ds"),
    )
    known = spine.join(
        models.select("branch"), on="branch", how="left_semi"
    )
    scored = score(models, known.select("branch", "ds").distinct())
    frame = (
        known.join(scored, on=["branch", "ds"])
        .select(
            "branch",
            "move_type",
            "input_date",
            "ds",
            # integer Count, not raw yhat_upper — see forecast_request
            F.col("count").cast("double").alias("branch_forecast"),
        )
    )
    # The tail is keyed by the full request identity (branch, move_type,
    # input_date, ds) — the scaling percentage depends on the request's
    # input date, so requests with overlapping windows but different input
    # dates legitimately produce different rows. forecast_tail carries
    # input_date through, so no re-attach join is needed.
    return forecast_tail(frame, pct, month_grain_percentages(pct))
