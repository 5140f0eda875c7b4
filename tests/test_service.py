"""End-to-end service-path tests: the reference's two endpoints as single
Spark jobs (plans/service.py), including every validation rule."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

TODAY = dt.date(1999, 6, 1)
MAX = dt.date(1999, 7, 31)


@pytest.fixture(scope="module")
def models(spark):
    from move_forecast_ind_spark.plans.training import train_models
    from move_forecast_ind_spark.queries.ml import _daily_series

    return train_models(_daily_series(spark, SF_SMALL), cutoff="1998-12-31").cache()


@pytest.fixture(scope="module")
def pct(spark):
    from move_forecast_ind_spark.plans.percentages import compute_percentages
    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    return compute_percentages(
        li, "l_suppkey", "l_returnflag", "l_shipdate", "l_quantity"
    ).cache()


def test_forecast_request_end_to_end(spark, models, pct):
    from move_forecast_ind_spark.plans.service import (
        forecast_request,
        forecast_response,
    )

    daily, summary = forecast_request(
        spark, models, pct, date="1999-06-03", branch=7, move_type="R",
        today=TODAY, max_date=MAX,
    )
    rows = daily.collect()
    assert len(rows) == 7  # full window fits
    assert all(r.predicted_moves >= 0 for r in rows)
    assert all(r.band in ("stronger", "consistent", "weaker") for r in rows)
    s = summary.collect()
    assert len(s) == 1 and s[0].n_days == 7
    resp = forecast_response(daily, summary).collect()
    assert len(resp) == 1
    assert len(resp[0].daily_forecast) == 7
    assert resp[0].summary.total_predicted_moves == sum(r.predicted_moves for r in rows)
    # JSON boundary (S7)
    import json

    j = json.loads(forecast_response(daily, summary).toJSON().first())
    assert set(j) == {"branch", "move_type", "daily_forecast", "summary"}


def test_forecast_window_clamps_at_horizon(spark, models, pct):
    from move_forecast_ind_spark.plans.service import forecast_request

    daily, _ = forecast_request(
        spark, models, pct, date="1999-07-31", branch=3, move_type=None,
        today=TODAY, max_date=MAX,
    )
    ds = sorted(r.ds for r in daily.collect())
    assert ds[-1] == MAX
    assert len(ds) == 7


def test_bad_date_and_horizon_rejected(spark, models, pct):
    from move_forecast_ind_spark.plans.service import RequestError, forecast_request

    with pytest.raises(RequestError):
        forecast_request(spark, models, pct, "1999/06/03", 7, None, TODAY, MAX)
    with pytest.raises(RequestError):
        forecast_request(spark, models, pct, "1999-08-01", 7, None, TODAY, MAX)


def test_unknown_branch_rejected(spark, models, pct):
    from move_forecast_ind_spark.plans.service import RequestError, forecast_request

    with pytest.raises(RequestError):
        forecast_request(spark, models, pct, "1999-06-03", 10**9, None, TODAY, MAX)


def test_unknown_move_type_demoted_to_100pct(spark, models, pct):
    from move_forecast_ind_spark.plans.service import forecast_request

    daily, _ = forecast_request(
        spark, models, pct, date="1999-06-03", branch=7,
        move_type="NOT_A_REAL_TYPE", today=TODAY, max_date=MAX,
    )
    rows = daily.collect()
    assert all(r.move_type is None for r in rows)
    assert all(abs(r.pct_used - 100.0) < 1e-9 for r in rows)


def test_trends_request_end_to_end(spark):
    from move_forecast_ind_spark.plans.service import trends_request
    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    nested = trends_request(
        spark, li, branch_col="l_suppkey", date_col="l_shipdate",
        count_col="l_quantity", date="1999-06-03", branch=7, move_type=None,
        type_col="l_returnflag", today=TODAY, max_date=MAX, years=(1995, 2000),
    )
    rows = nested.collect()
    assert rows, "expected at least one year of trend data"
    assert all(isinstance(r.days, str) and r.days for r in rows)
    years = [r.year for r in rows]
    assert years == sorted(years)


def test_forecast_batch_matches_single_requests(spark, models, pct):
    """The batched path must produce the same daily rows as issuing each
    request singly (same clamp, same scoring, same tail)."""
    import datetime as dt

    from move_forecast_ind_spark.plans.service import (
        forecast_batch,
        forecast_request,
    )

    reqs = [(3, "R", "1999-06-03"), (7, None, "1999-07-30")]
    req_df = spark.createDataFrame(
        [(b, mt, dt.date.fromisoformat(d)) for b, mt, d in reqs],
        "branch long, move_type string, input_date date",
    )
    batch = forecast_batch(spark, models, pct, req_df, today=TODAY, max_date=MAX)
    got = {
        (r.branch, r.move_type, str(r.input_date), str(r.ds)): r.predicted_moves
        for r in batch.collect()
    }
    expected = {}
    for b, mt, d in reqs:
        daily, _ = forecast_request(
            spark, models, pct, date=d, branch=b, move_type=mt,
            today=TODAY, max_date=MAX,
        )
        for r in daily.collect():
            expected[(b, mt, d, str(r.ds))] = r.predicted_moves
    assert got == expected


def test_forecast_batch_overlapping_windows_no_duplicates(spark, models, pct):
    """Two requests for the same (branch, move_type) with overlapping
    windows must each get exactly one row per day (regression: the tail
    re-attach join used to multiply rows across overlapping requests)."""
    import datetime as dt

    from move_forecast_ind_spark.plans.service import forecast_batch

    req_df = spark.createDataFrame(
        [(7, "R", dt.date(1999, 6, 3)), (7, "R", dt.date(1999, 6, 5))],
        "branch long, move_type string, input_date date",
    )
    batch = forecast_batch(spark, models, pct, req_df, today=TODAY, max_date=MAX)
    rows = batch.collect()
    keys = [(r.branch, r.move_type, r.input_date, r.ds) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (request, day) rows"
    per_req = {}
    for r in rows:
        per_req.setdefault(r.input_date, set()).add(r.ds)
    assert all(len(days) == 7 for days in per_req.values())


def test_forecast_batch_demotes_unknown_move_type(spark, models, pct):
    """Batch path must apply the same silent demotion as the single path:
    unknown move_type -> NULL -> 100% (regression: it used to fall through
    to the 1.0% constant)."""
    import datetime as dt

    from move_forecast_ind_spark.plans.service import forecast_batch

    req_df = spark.createDataFrame(
        [(7, "NOT_A_REAL_TYPE", dt.date(1999, 6, 3))],
        "branch long, move_type string, input_date date",
    )
    rows = forecast_batch(
        spark, models, pct, req_df, today=TODAY, max_date=MAX
    ).collect()
    assert rows and all(r.move_type is None for r in rows)
    assert all(abs(r.pct_used - 100.0) < 1e-9 for r in rows)
