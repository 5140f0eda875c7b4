"""Date window logic shared by the forecast and trends pipelines.

The reference duplicates its 7-day window clamp verbatim in two places
(reference main.py:215-228 and main.py:346-359) and hides a wall-clock read
inside it (``datetime.now()``). Here it is one pure function with the clock
injected, so every query that uses it is replayable (SURVEY.md §5.4).
"""

from __future__ import annotations

import datetime as dt

SPAN_DAYS = 7
HALF = 3  # window is input_date ± HALF, then clamped


def forecast_window(
    input_date: dt.date, today: dt.date, max_date: dt.date
) -> tuple[dt.date, dt.date]:
    """Clamp the 7-day window centered on ``input_date`` into
    [today, max_date], snapping to a full 7-day span at either boundary
    (semantics of reference main.py:215-228):

    - start = input-3, end = input+3
    - if start < today:    start = today,   end = min(today+6, max_date)
    - if end   > max_date: end  = max_date, start = max(end-6, today)

    The result is always within [today, max_date]; it spans 7 days whenever
    the interval allows; it contains input_date whenever feasible.
    """
    if today > max_date:
        raise ValueError(f"today {today} is past max_date {max_date}")
    one = dt.timedelta(days=1)
    start = input_date - HALF * one
    end = input_date + HALF * one
    if start < today:
        start = today
        end = min(today + (SPAN_DAYS - 1) * one, max_date)
    if end > max_date:
        end = max_date
        start = max(end - (SPAN_DAYS - 1) * one, today)
    return start, end


def forecast_window_cols(input_date, today, max_date):
    """Column-expression twin of :func:`forecast_window` for BATCHED
    requests: given per-row input dates (and today/max as columns or
    literals), compute the clamped [start, end] per row so a whole batch of
    forecast requests plans as ONE Spark job (no driver-side loop over
    requests). Must mirror the scalar version exactly — property-tested
    against it in tests/test_window_clamp.py.
    """
    from pyspark.sql import functions as F

    one_start = F.date_sub(input_date, HALF)
    one_end = F.date_add(input_date, HALF)
    # clamp at today (snap forward)
    start1 = F.when(one_start < today, today).otherwise(one_start)
    end1 = F.when(
        one_start < today, F.least(F.date_add(today, SPAN_DAYS - 1), max_date)
    ).otherwise(one_end)
    # clamp at max_date (snap backward)
    start2 = F.when(
        end1 > max_date, F.greatest(F.date_sub(max_date, SPAN_DAYS - 1), today)
    ).otherwise(start1)
    end2 = F.when(end1 > max_date, max_date).otherwise(end1)
    return start2, end2
