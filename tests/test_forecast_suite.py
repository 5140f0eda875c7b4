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


def test_learning_curve_nested_fractions(spark):
    """Larger fractions contain the smaller (nested subsampling), so
    n_train_days is nondecreasing in train_pct per type, covers the
    full 23-day train window at 100%, and every (type, pct) cell is
    scored on the same 7-day holdout."""
    rows = _q(spark, "ml_learning_curve").collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r.event_type][r.train_pct] = r
        assert r.n_test == 7
        assert r.rmse >= 0.0
    for ty, d in by_type.items():
        pcts = sorted(d)
        assert pcts[-1] == 100
        assert d[100].n_train_days == 23
        for a, b in zip(pcts, pcts[1:]):
            assert d[a].n_train_days <= d[b].n_train_days, (ty, a, b)


def test_shapley_efficiency_and_replica(spark):
    """Shapley efficiency must hold: shap_trend + shap_weekend ==
    r2_full (to the shared grid); each R² recomputed from scratch must
    match; R² values live in [0, 1] and r2_full >= max(single)."""
    spine, mn, mx = _daily(spark)
    rows = _q(spark, "ml_shapley_r2").collect()
    assert len(rows) == 5
    for r in rows:
        assert abs((r.shap_trend + r.shap_weekend) - r.r2_full) < 3e-6
        for v in (r.r2_trend, r.r2_weekend, r.r2_full):
            assert -1e-9 <= v <= 1.0 + 1e-9
        assert r.r2_full >= max(r.r2_trend, r.r2_weekend) - 1e-6
        pts = [
            (
                (d - mn).days,
                1 if (d.isoweekday() % 7 + 1) in (1, 7) else 0,
                n,
            )
            for (ty, d), n in spine.items()
            if ty == r.event_type
        ]
        n = len(pts)
        s1 = sum(p[0] for p in pts)
        s2 = sum(p[1] for p in pts)
        sy = sum(p[2] for p in pts)
        c11 = n * sum(p[0] * p[0] for p in pts) - s1 * s1
        c22 = n * sum(p[1] * p[1] for p in pts) - s2 * s2
        c12 = n * sum(p[0] * p[1] for p in pts) - s1 * s2
        c1y = n * sum(p[0] * p[2] for p in pts) - s1 * sy
        c2y = n * sum(p[1] * p[2] for p in pts) - s2 * sy
        cyy = n * sum(p[2] * p[2] for p in pts) - sy * sy
        r2_1 = c1y * c1y / (c11 * cyy)
        r2_2 = c2y * c2y / (c22 * cyy)
        r2_12 = (
            c1y * (c22 * c1y - c12 * c2y) + c2y * (c11 * c2y - c12 * c1y)
        ) / ((c11 * c22 - c12 * c12) * cyy)
        assert abs(r.r2_trend - math.floor(r2_1 * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(r.r2_weekend - math.floor(r2_2 * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(r.r2_full - math.floor(r2_12 * 1e6 + 0.5) / 1e6) < 1e-9


def test_interval_allocation_conserves_revenue(spark):
    """Allocated revenue summed over months must equal total order value
    exactly on the cents-days grid (each order contributes cents*14/14),
    and every order's window spans at most two months here."""
    from move_forecast_ind_spark.sources import load_table

    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_totalprice"
    ).collect()
    total = sum(
        math.floor(o.o_totalprice * 100 + 0.5) for o in orders
    )
    rows = _q(spark, "j_interval_allocation").collect()
    assert rows
    alloc = sum(r.allocated_revenue for r in rows)
    assert abs(alloc - total / 100) < 0.5  # cents-days grid rounding
    assert all(r.n_orders > 0 for r in rows)


def test_ar2_recursion_replica(spark):
    """phi1/phi2 and the 7-step recursion recomputed from scratch must
    match; forecasts revert toward the series mean as h grows when
    |phi| < 1."""
    spine, mn, mx = _daily(spark)
    rows = defaultdict(dict)
    for r in _q(spark, "ml_ar2_forecast").collect():
        rows[r.event_type][r.h] = r
    for ty in rows:
        ys = [
            n
            for (tyy, d), n in sorted(spine.items(), key=lambda kv: kv[0][1])
            if tyy == ty
        ]
        n = len(ys)
        sy = sum(ys)
        ybar = sy / n
        s00 = sum(y * y for y in ys)
        c0 = s00 - ybar * (sy + sy) + n * ybar * ybar

        def ck(k):
            sab = sum(ys[i] * ys[i - k] for i in range(k, n))
            sa = sum(ys[k:])
            sb = sum(ys[: n - k])
            return sab - ybar * (sa + sb) + (n - k) * ybar * ybar

        r1, r2 = ck(1) / c0, ck(2) / c0
        phi1 = r1 * (1 - r2) / (1 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
        p2, p1 = float(ys[-2]), float(ys[-1])
        for h in range(1, 8):
            yh = ybar + phi1 * (p1 - ybar) + phi2 * (p2 - ybar)
            got = rows[ty][h]
            assert abs(got.forecast - math.floor(yh * 1e4 + 0.5) / 1e4) < 1e-9
            assert abs(got.phi1 - math.floor(phi1 * 1e6 + 0.5) / 1e6) < 1e-9
            p2, p1 = p1, yh
        # mean reversion when stationary
        if abs(phi1) + abs(phi2) < 1:
            d1 = abs(rows[ty][1].forecast - ybar)
            d7 = abs(rows[ty][7].forecast - ybar)
            assert d7 <= d1 + 1e-6


def test_quantile_forecast_band_order(spark):
    """P10 <= P50 <= P90 everywhere, all from the observed support, one
    band per future day per type."""
    spine, mn, mx = _daily(spark)
    rows = _q(spark, "ml_quantile_forecast").collect()
    assert len(rows) == 35
    support = defaultdict(set)
    for (ty, d), n in spine.items():
        support[ty].add(n)
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        for v in (r.p10, r.p50, r.p90):
            assert v in support[r.event_type]


def test_forecast_combination_internal_consistency(spark):
    """best_single SMAPE <= both single alternatives implied by the
    winner name; ensembles within the convex range sanity (equal combo
    SMAPE can exceed best single, but all values in [0,2]); verdict
    recomputable from the emitted numbers."""
    rows = _q(spark, "ml_forecast_combination").collect()
    assert len(rows) == 5
    for r in rows:
        for v in (r.smape_equal, r.smape_weighted, r.smape_best_single):
            assert 0.0 <= v <= 2.0
        assert r.best_single in ("last", "mean", "seasonal")
        combo_best = min(r.smape_equal, r.smape_weighted)
        # r6 grid: re-derive the verdict with grid slack
        if combo_best < r.smape_best_single - 2e-6:
            assert r.combo_beats_best
        if combo_best > r.smape_best_single + 2e-6:
            assert not r.combo_beats_best
