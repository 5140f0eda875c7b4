"""Invariant and replica tests for the forecast-production suite
(queries/forecast_suite.py): reconciliation coherence, conformal
coverage-by-construction, stump optimality vs a brute-force replica,
and model-selection argmin consistency.

Correctness vs DuckDB is covered by the parametrized oracle suite
(test_oracle.py); these pin the mathematical properties an oracle diff
can't see (a shared mistake in both engines would still diff clean — a
from-scratch replica can't)."""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL


def _q(spark, name):
    from move_forecast_ind_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF_SMALL)


def _daily(spark):
    """Python replica of the zero-filled daily spine."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_type", "ts"
    ).collect()
    counts = defaultdict(int)
    days = set()
    types = set()
    for r in ev:
        d = r.ts.date()
        counts[(r.event_type, d)] += 1
        days.add(d)
        types.add(r.event_type)
    mn, mx = min(days), max(days)
    spine = {}
    d = mn
    while d <= mx:
        for t in types:
            spine[(t, d)] = counts.get((t, d), 0)
        d = d + __import__("datetime").timedelta(days=1)
    return spine, mn, mx


# --- ml_forecast_reconcile ----------------------------------------------------


def test_reconcile_topdown_sums_to_top(spark):
    """Top-down reconciled forecasts must be coherent BY CONSTRUCTION:
    per future day, sum(topdown_fc) == yhat_top (to rounding grain),
    i.e. sum(topdown) - sum(base) == bu_gap. Shares must sum to 1."""
    rows = _q(spark, "ml_forecast_reconcile").collect()
    assert len(rows) == 7 * 5
    by_day = defaultdict(list)
    for r in rows:
        by_day[r.day].append(r)
    for day, rs in by_day.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-5
        td = sum(r.topdown_fc for r in rs)
        base = sum(r.base_fc for r in rs)
        # bu_gap = yhat_top - sum(base); coherence: sum(td) == yhat_top
        gap = rs[0].bu_gap
        assert abs((td - base) - gap) < 1e-4, (day, td, base, gap)
        # every row of a day carries the same gap
        assert len({r.bu_gap for r in rs}) == 1


def test_reconcile_trend_replica(spark):
    """The top-level OLS trend forecast (reconstructed as
    sum(topdown_fc) per day) must match a from-scratch least-squares fit
    on the total daily series."""
    spine, mn, mx = _daily(spark)
    tot = defaultdict(int)
    for (t, d), n in spine.items():
        tot[(d - mn).days] += n
    ts = sorted(tot)
    n = len(ts)
    st = sum(ts)
    stt = sum(t * t for t in ts)
    sy = sum(tot[t] for t in ts)
    sty = sum(t * tot[t] for t in ts)
    slope = (n * sty - st * sy) / (n * stt - st * st)
    icept = (sy - slope * st) / n
    rows = _q(spark, "ml_forecast_reconcile").collect()
    by_day = defaultdict(float)
    for r in rows:
        by_day[r.day] += r.topdown_fc
    for day, td in by_day.items():
        t = (day - mn).days
        assert abs(td - (icept + slope * t)) < 1e-4, (day, td)


# --- ml_conformal_interval ------------------------------------------------------


def test_conformal_calibration_coverage(spark):
    """With k = 6 of n_cal = 7, at least 6 of the 7 calibration
    residuals per type must lie within the emitted half-width — the
    finite-sample property split conformal is FOR."""
    spine, mn, mx = _daily(spark)
    rows = _q(spark, "ml_conformal_interval").collect()
    assert len(rows) == 35
    # reconstruct train weekday means + calibration scores per type
    half = {}
    for r in rows:
        w = (r.hi - r.lo) / 2.0
        half.setdefault(r.event_type, w)
        assert abs((r.hi - r.lo) / 2.0 - half[r.event_type]) < 1e-3
        assert r.lo <= r.point <= r.hi
        assert r.n_cal == 7
    means = defaultdict(lambda: [0, 0])
    for (ty, d), n in spine.items():
        t = (d - mn).days
        if t <= 22:
            key = (ty, d.isoweekday() % 7 + 1)  # Spark dow: 1=Sunday
            means[key][0] += n
            means[key][1] += 1
    for ty in {k[0] for k in spine}:
        scores = []
        for (tyy, d), n in spine.items():
            if tyy != ty or (d - mn).days <= 22:
                continue
            m = means[(ty, d.isoweekday() % 7 + 1)]
            scores.append(abs(n - m[0] / m[1]))
        # half is reconstructed from r4-rounded endpoints, so allow the
        # rounding grain when a score sits exactly at the quantile
        covered = sum(1 for s in scores if s <= half[ty] + 2e-4)
        assert covered >= 6, (ty, sorted(scores), half[ty])


# --- ml_decision_stump -----------------------------------------------------------


def test_stump_brute_force_replica(spark):
    """The ranked-1 threshold must equal the brute-force best split on
    the raw rows, and every candidate's Gini must match a from-scratch
    computation."""
    from move_forecast_ind_spark.sources import load_table

    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    pts = [(o.o_totalprice, 1 if o.o_orderstatus == "F" else 0) for o in orders]
    nt = len(pts)
    ft = sum(y for _, y in pts)
    rows = _q(spark, "ml_decision_stump").collect()
    assert rows
    best = None
    for r in rows:
        nl = sum(1 for p, _ in pts if p < r.threshold)
        fl = sum(y for p, y in pts if p < r.threshold)
        nr, fr = nt - nl, ft - fl
        assert (nl, nr) == (r.n_left, r.n_right)
        g = (
            (nl - (fl * fl + (nl - fl) ** 2) / nl)
            + (nr - (fr * fr + (nr - fr) ** 2) / nr)
        ) / nt
        assert abs(g - r.gini) < 1e-6
        key = (math.floor(g * 1e6 + 0.5), r.threshold)
        if best is None or key < best[0]:
            best = (key, r.threshold)
    winner = [r for r in rows if r.is_best]
    assert len(winner) == 1 and winner[0].rk == 1
    assert winner[0].threshold == best[1]
    # ranks are a permutation 1..n
    assert sorted(r.rk for r in rows) == list(range(1, len(rows) + 1))


# --- ml_model_selection ----------------------------------------------------------


def test_model_selection_winner_is_argmin(spark):
    """The declared winner's SMAPE must be <= the other two (with the
    documented last < mean < seasonal tie preference), and all SMAPEs
    in [0, 2]."""
    rows = _q(spark, "ml_model_selection").collect()
    assert len(rows) == 5
    for r in rows:
        vals = {
            "last": r.smape_last,
            "seasonal": r.smape_seasonal,
            "mean": r.smape_mean,
        }
        for v in vals.values():
            assert 0.0 <= v <= 2.0
        wmin = min(vals.values())
        assert vals[r.winner] <= wmin + 1e-6
        # tie preference: if winner isn't 'last', 'last' must be strictly
        # worse than the winner (last wins all its ties)
        if r.winner != "last":
            assert vals["last"] > vals[r.winner] - 1e-9 and vals[
                "last"
            ] != vals[r.winner]


def test_model_selection_smape_replica(spark):
    """One model's SMAPE (train-mean) recomputed from scratch must match
    the emitted value to the rounding grain."""
    spine, mn, mx = _daily(spark)
    rows = {r.event_type: r for r in _q(spark, "ml_model_selection").collect()}
    for ty in rows:
        train = [
            n
            for (tyy, d), n in spine.items()
            if tyy == ty and (d - mn).days <= 22
        ]
        hold = [
            n
            for (tyy, d), n in spine.items()
            if tyy == ty and (d - mn).days > 22
        ]
        fc = sum(train) / len(train)
        terms = [
            math.floor(2.0 * abs(fc - y) / (abs(fc) + abs(y)) * 1e9 + 0.5)
            for y in hold
        ]
        smape = math.floor(sum(terms) / len(terms) / 1e9 * 1e6 + 0.5) / 1e6
        assert abs(smape - rows[ty].smape_mean) < 1e-9, ty
