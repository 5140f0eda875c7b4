"""ML-path tests: determinism, forecast sanity across the three tiers
(regr aggregates / per-branch Fourier OLS / global MLlib)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def historical_means(spark):
    from move_forecast_ind_spark.queries.ml import _daily_series

    rows = (
        _daily_series(spark, SF_SMALL)
        .filter(F.col("branch").between(1, 10))
        .groupBy("branch")
        .agg(F.avg("y").alias("mu"), F.stddev("y").alias("sd"))
        .collect()
    )
    return {r.branch: (r.mu, r.sd or 0.0) for r in rows}


@pytest.mark.parametrize(
    "qname", ["ml_linreg_forecast", "ml_forecast_fourier", "ml_mllib_global_forecast"]
)
def test_forecasts_are_sane_and_deterministic(spark, historical_means, qname):
    from move_forecast_ind_spark.queries import REGISTRY

    fn = REGISTRY[qname].fn
    rows = fn(spark, SF_SMALL).collect()
    # 10 branches × 7 days, minus branches with no usable training series
    # at this scale factor (the <2-rows guard drops them from the registry)
    assert rows and len(rows) % 7 == 0 and len(rows) <= 70
    assert {r.branch for r in rows} <= set(range(1, 11))
    again = fn(spark, SF_SMALL).collect()
    assert sorted(map(repr, rows)) == sorted(map(repr, again)), "nondeterministic"
    for r in rows:
        if r.branch not in historical_means:
            continue  # no history at this sf: global model falls back to baseline
        mu, sd = historical_means[r.branch]
        # a linear/seasonal model's 6-month-ahead point forecast should stay
        # within a generous envelope of the historical distribution
        assert abs(r.yhat - mu) < max(6 * sd, 0.8 * mu + 10), (
            f"{qname} branch {r.branch} yhat {r.yhat} vs mu {mu} sd {sd}"
        )
        assert r["count"] >= 0


def test_fourier_upper_bound_above_point(spark):
    from move_forecast_ind_spark.queries import REGISTRY

    rows = REGISTRY["ml_forecast_fourier"].fn(spark, SF_SMALL).collect()
    assert all(r.yhat_upper >= r.yhat for r in rows)


def test_prophet_tier_gated_cleanly(spark):
    """The reference-exact Prophet tier must fail with a clear
    NotImplementedError when the library is absent (import-try gate)."""
    import pytest as _pytest

    from move_forecast_ind_spark.plans.training import train_prophet_models
    from move_forecast_ind_spark.queries.ml import _daily_series

    try:
        import prophet  # noqa: F401

        _pytest.skip("prophet installed; gate not exercised")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError):
        train_prophet_models(_daily_series(spark, SF_SMALL), cutoff="1998-12-31")
