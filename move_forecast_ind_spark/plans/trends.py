"""Historical trends as ONE aggregate query (SURVEY.md §3.2).

The reference answers "show this branch's daily totals for this calendar
window across years" with six sequential DB round-trips — one per year, each
a filter + GROUP BY + ORDER BY (reference main.py:363-393). That is a UNION
ALL of six year-slices of the same query, i.e. one query with the year as a
derived group key.

Spark-first: derive year(date) as a column, apply the calendar-window
predicate once, aggregate once. One scan, one shuffle, any number of years.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import r2


def historical_trends(
    facts: DataFrame,
    branch_col: str,
    date_col: str,
    count_col: str,
    branch,
    window_start: dt.date,
    window_end: dt.date,
    years: tuple[int, int],
    type_col: str | None = None,
    move_type=None,
) -> DataFrame:
    """Per-year daily totals for one branch over a (month, day) window.

    ``window_start``/``window_end`` give the calendar window (their year is
    ignored); the predicate projects it into every year in ``years`` via
    (month, day) tuple comparison — one pass, no per-year loop. A window that
    crosses a year boundary (e.g. Dec 29 → Jan 4) becomes an OR of the two
    calendar spans, matching the reference's per-year BETWEEN behavior.

    Output: year, ds (date), month_day 'MM-dd', total_moves.
    """
    md = F.month(date_col) * 100 + F.dayofmonth(date_col)
    lo = window_start.month * 100 + window_start.day
    hi = window_end.month * 100 + window_end.day
    in_window = (md >= lo) & (md <= hi) if lo <= hi else (md >= lo) | (md <= hi)

    df = facts.filter(F.col(branch_col) == branch)
    if type_col is not None and move_type is not None:
        df = df.filter(F.col(type_col) == move_type)
    return (
        df.filter(F.year(date_col).between(*years))
        .filter(in_window)
        .groupBy(
            F.year(date_col).alias("year"),
            F.col(date_col).cast("date").alias("ds"),
        )
        .agg(r2(F.sum(count_col)).alias("total_moves"))
        .withColumn("month_day", F.date_format("ds", "MM-dd"))
        .select("year", "ds", "month_day", "total_moves")
        .orderBy("year", "ds")
    )


def trends_nested(trends: DataFrame) -> DataFrame:
    """The nested per-year response shape (reference main.py:395-403):
    one row per year with the day rows serialized in date order. Serialized
    as a sorted 'MM-dd:moves' string so the value is hash-stable across
    engines (JSON whitespace/key-order is not)."""
    return (
        trends.groupBy("year")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ds", "month_day", "total_moves"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["month_day"],
                        s["total_moves"].cast("string"),
                    ),
                ),
                ",",
            ).alias("days")
        )
        .orderBy("year")
    )
