"""HTTP facade tests: the reference's FastAPI surface served by the stdlib
ThreadingHTTPServer over real request/response JSON (move_forecast_ind_spark/
server.py), against the sf0.001 lake."""

from __future__ import annotations

import datetime as dt
import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

TODAY = dt.date(1999, 6, 1)
MAX = dt.date(1999, 7, 31)


@pytest.fixture(scope="module")
def server(spark):
    from move_forecast_ind_spark.plans.percentages import compute_percentages
    from move_forecast_ind_spark.plans.training import train_models
    from move_forecast_ind_spark.queries.ml import _daily_series
    from move_forecast_ind_spark.server import ServingContext, serve
    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem").cache()
    ctx = ServingContext(
        spark=spark,
        models=train_models(_daily_series(spark, SF_SMALL), cutoff="1998-12-31").cache(),
        pct=compute_percentages(
            li, "l_suppkey", "l_returnflag", "l_shipdate", "l_quantity"
        ).cache(),
        facts=li,
        branch_col="l_suppkey",
        date_col="l_shipdate",
        count_col="l_quantity",
        type_col="l_returnflag",
        today=TODAY,
        max_date=MAX,
        years=(1995, 1998),
    )
    srv = serve(ctx)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    # Unpersist: a cached lineitem would make every later scan of the same
    # parquet an InMemoryRelation, hiding PushedFilters from the
    # plan-shape tests (order-dependent cross-test leak).
    ctx.models.unpersist()
    ctx.pct.unpersist()
    li.unpersist()


def _post(url: str, path: str, body: dict):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_root_endpoint(server):
    with urllib.request.urlopen(server + "/") as resp:
        assert resp.status == 200
        assert "Forecast" in json.loads(resp.read())["message"]


def test_forecast_endpoint_end_to_end(server):
    status, out = _post(
        server, "/forecast/", {"date": "1999-06-03", "branch": 7, "move_type": "R"}
    )
    assert status == 200
    assert out["branch"] == 7 and out["move_type"] == "R"
    days = out["predicted_summary"]
    assert 1 <= len(days) <= 7
    assert all(
        isinstance(d["predicted_moves"], int) and d["predicted_moves"] >= 0
        for d in days
    )
    assert [d["date"] for d in days] == sorted(d["date"] for d in days)
    assert out["total_predicted_moves"] == sum(d["predicted_moves"] for d in days)
    assert out["forecast_window"]["start_date"] == days[0]["date"]
    assert out["summary_comment"]  # banded phrase with current vs hist share
    assert "R" in out["summary_comment"]


def test_forecast_unknown_move_type_demoted(server):
    """Silent demotion (reference main.py:204-209): unknown type → None,
    100% of the branch forecast, branch-level summary comment."""
    status, out = _post(
        server, "/forecast/", {"date": "1999-06-03", "branch": 7, "move_type": "ZZ"}
    )
    assert status == 200
    assert out["move_type"] is None
    assert out["summary_comment"].startswith("Branch-level forecast")


def test_forecast_validation_errors(server):
    for body, frag in [
        ({"date": "1999/06/03", "branch": 7}, "YYYY-MM-DD"),
        ({"date": "1999-08-15", "branch": 7}, "capped"),
        ({"date": "1999-06-03", "branch": 10**9}, "unknown branch"),
        ({"date": "1999-06-03"}, "branch"),
        ({"date": "1999-06-03", "branch": "x"}, "integer"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/forecast/", body)
        assert e.value.code == 400
        assert frag in json.loads(e.value.read())["detail"]


def test_trends_endpoint(server):
    status, out = _post(
        server, "/historical_trends/", {"date": "1999-06-03", "branch": 7}
    )
    assert status == 200
    assert out["branch"] == 7
    years = [y["year"] for y in out["historical_trends"]]
    assert years == [1995, 1996, 1997, 1998]
    # at least one year has day rows, each shaped {date: 'MM-DD', moves}
    flat = [d for y in out["historical_trends"] for d in y["data"]]
    assert flat and all(len(d["date"]) == 5 and d["moves"] > 0 for d in flat)
    assert out["window"]["start_date"] == "1999-06-01"


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope/", {})
    assert e.value.code == 404
