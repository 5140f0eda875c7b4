"""Unit + property tests for the 7-day forecast window clamp
(reference main.py:215-228 semantics; SURVEY.md §5.3)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from move_forecast_ind_spark.functions.datetime_fns import forecast_window

D = dt.date
ONE = dt.timedelta(days=1)

TODAY = D(2025, 6, 10)
MAX = D(2025, 7, 31)


def test_centered_window():
    s, e = forecast_window(D(2025, 7, 1), TODAY, MAX)
    assert (s, e) == (D(2025, 6, 28), D(2025, 7, 4))


def test_clamped_to_today_snaps_forward():
    s, e = forecast_window(D(2025, 6, 11), TODAY, MAX)
    assert (s, e) == (TODAY, TODAY + 6 * ONE)


def test_input_equals_today():
    s, e = forecast_window(TODAY, TODAY, MAX)
    assert (s, e) == (TODAY, TODAY + 6 * ONE)


def test_clamped_to_max_snaps_backward():
    s, e = forecast_window(D(2025, 7, 30), TODAY, MAX)
    assert (s, e) == (MAX - 6 * ONE, MAX)


def test_input_at_max():
    s, e = forecast_window(MAX, TODAY, MAX)
    assert (s, e) == (MAX - 6 * ONE, MAX)


def test_narrow_feasible_interval():
    today = D(2025, 7, 28)
    s, e = forecast_window(D(2025, 7, 31), today, MAX)
    assert (s, e) == (today, MAX)
    assert (e - s).days == 3  # interval narrower than 7 days


def test_today_past_max_raises():
    with pytest.raises(ValueError):
        forecast_window(D(2025, 8, 2), D(2025, 8, 1), MAX)


@given(
    input_off=st.integers(min_value=-400, max_value=400),
    today_off=st.integers(min_value=0, max_value=120),
)
@settings(max_examples=300, deadline=None)
def test_window_properties(input_off: int, today_off: int):
    today = TODAY + today_off * ONE
    if today > MAX:
        return
    input_date = TODAY + input_off * ONE
    s, e = forecast_window(input_date, today, MAX)
    # always within bounds
    assert today <= s <= e <= MAX
    # never longer than 7 days
    assert (e - s).days <= 6
    # full span whenever the interval allows
    if (MAX - today).days >= 6:
        assert (e - s).days == 6
    # contains input date whenever feasible
    if today <= input_date <= MAX and (e - s).days == 6:
        lo, hi = min(s, input_date), max(e, input_date)
        assert (hi - lo).days <= 9  # input is within 3 days of the window


def test_column_clamp_matches_scalar(spark):
    """The batched (column-expression) clamp must agree with the scalar
    clamp on a grid of inputs spanning every boundary case."""
    import itertools

    from pyspark.sql import functions as F

    from move_forecast_ind_spark.functions.datetime_fns import (
        forecast_window,
        forecast_window_cols,
    )

    inputs = [TODAY + k * ONE for k in range(-10, 60, 7)] + [
        TODAY, MAX, MAX - ONE, TODAY + ONE
    ]
    rows = [(i, d) for i, d in enumerate(inputs)]
    df = spark.createDataFrame(rows, "id int, input_date date")
    s, e = forecast_window_cols(
        F.col("input_date"),
        F.lit(str(TODAY)).cast("date"),
        F.lit(str(MAX)).cast("date"),
    )
    got = {
        r.id: (r.s, r.e)
        for r in df.select("id", s.alias("s"), e.alias("e")).collect()
    }
    for i, d in rows:
        assert got[i] == forecast_window(d, TODAY, MAX), f"input {d}"


def test_svc_batch_oracle_window_literals():
    """Pin the two clamped window starts that _svc_batch_oracle
    (queries/ml.py) hard-codes as SQL literals to the clamp helper's
    actual output, so a change to forecast_window's clamp logic fails
    HERE instead of silently desynchronizing the oracle from the Spark
    path (ADVICE r5)."""
    today, mx = dt.date(1999, 6, 1), dt.date(1999, 7, 31)
    assert forecast_window(dt.date(1999, 6, 3), today, mx) == (
        dt.date(1999, 6, 1), dt.date(1999, 6, 7)
    )
    assert forecast_window(dt.date(1999, 7, 30), today, mx) == (
        dt.date(1999, 7, 25), dt.date(1999, 7, 31)
    )
    # and the literals actually appear in the oracle SQL
    from move_forecast_ind_spark.queries.ml import _svc_batch_oracle

    sql = _svc_batch_oracle()
    for lit in ("DATE '1999-06-01'", "DATE '1999-07-25'"):
        assert lit in sql
