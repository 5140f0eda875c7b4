"""Invariant/replica tests for the serving-layer feature wave
(queries/features.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL


def _q(spark, name):
    from move_forecast_ind_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF_SMALL)


def test_decayed_engagement_replica(spark):
    """Per-user score recomputed from raw events must match to the r4
    grain; decay means score < undecayed value sum; recency >= 0."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    t_now = max(int(r.ts.timestamp() * 1e6) for r in ev)
    lam = 9.902102579427789e-2
    scores = defaultdict(float)
    raw = defaultdict(float)
    n = defaultdict(int)
    last = {}
    for r in ev:
        us = int(r.ts.timestamp() * 1e6)
        age_d = (t_now - us) / 8.64e10
        scores[r.user_id] += r.value * math.exp(-lam * age_d)
        raw[r.user_id] += r.value
        n[r.user_id] += 1
        last[r.user_id] = min(last.get(r.user_id, age_d), age_d)
    rows = _q(spark, "events_decayed_engagement").collect()
    assert len(rows) == len(scores)
    for r in rows:
        assert r.n_events == n[r.user_id]
        assert abs(r.decayed_score - scores[r.user_id]) < 2e-4
        assert r.decayed_score <= raw[r.user_id] + 1e-6
        assert abs(r.days_since_last - last[r.user_id]) < 2e-4
        assert r.days_since_last >= 0.0


def test_ratio_to_parent_shares_sum_to_one(spark):
    """Leaf shares within each nation sum to 1, nation shares sum to 1,
    the grand-total row has no parent, and cents roll up exactly."""
    rows = _q(spark, "sql_ratio_to_parent").collect()
    leaves = [r for r in rows if r.lvl == 0]
    nations = [r for r in rows if r.lvl == 1]
    grand = [r for r in rows if r.lvl == 3]
    assert len(grand) == 1 and grand[0].share_of_parent is None
    assert abs(sum(r.share_of_parent for r in nations) - 1.0) < 1e-4
    by_nation = defaultdict(list)
    for r in leaves:
        by_nation[r.nation].append(r)
    ncents = {r.nation: r.cents for r in nations}
    for nat, rs in by_nation.items():
        assert abs(sum(r.share_of_parent for r in rs) - 1.0) < 1e-4
        assert sum(r.cents for r in rs) == ncents[nat]
    assert sum(r.cents for r in nations) == grand[0].cents
    assert sum(r.n_customers for r in nations) == grand[0].n_customers


def test_absorbing_markov_replica(spark):
    """Expected steps recomputed with a from-scratch 12-layer fixed
    point over transitions extracted in pure Python must match; steps
    within [1, 12]; conversion probabilities in [0, 1]."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    sts = ("click", "error", "signup", "view")
    cnt = defaultdict(int)
    out = defaultdict(int)
    absorb = defaultdict(int)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rs, rs[1:]):
            if a.event_type == "purchase":
                continue
            out[a.event_type] += 1
            cnt[(a.event_type, b.event_type)] += 1
            if b.event_type == "purchase":
                absorb[a.event_type] += 1
    q = {
        (f, t): cnt[(f, t)] / max(out[f], 1) for f in sts for t in sts
    }
    t = {s: 0.0 for s in sts}
    for _ in range(12):
        t = {
            f: (((1.0 + q[(f, sts[0])] * t[sts[0]])
                 + q[(f, sts[1])] * t[sts[1]])
                + q[(f, sts[2])] * t[sts[2]])
               + q[(f, sts[3])] * t[sts[3]]
            for f in sts
        }
    rows = {r.state: r for r in _q(spark, "events_absorbing_markov").collect()}
    assert set(rows) == set(sts)
    for f in sts:
        r = rows[f]
        assert r.n_transitions == out[f]
        assert abs(r.p_convert_1step - absorb[f] / max(out[f], 1)) < 1e-6
        assert abs(r.expected_steps - t[f]) < 1e-6
        assert 1.0 <= r.expected_steps <= 12.0
        assert 0.0 <= r.p_convert_1step <= 1.0


def test_ipf_raking_margins_converge(spark):
    """After 3 rounds the column (nation) margins are exact (the last
    step scales columns), row margins are near-target, total weight is
    conserved to the grid, and weights stay positive."""
    rows = _q(spark, "a_ipf_raking").collect()
    assert rows
    total_raw = sum(r.n_raw for r in rows)
    n_seg = len({r.segment for r in rows})
    n_nat = len({r.nation for r in rows})
    col_target = total_raw / n_nat
    row_target = total_raw / n_seg
    by_nat = defaultdict(float)
    by_seg = defaultdict(float)
    for r in rows:
        assert r.weight > 0
        assert r.rake_factor > 0
        by_nat[r.nation] += r.weight
        by_seg[r.segment] += r.weight
    for nat, w in by_nat.items():
        assert abs(w - col_target) < 1e-2, (nat, w, col_target)
    # row margins converge but are not exact after a col-last step
    for seg, w in by_seg.items():
        assert abs(w - row_target) / row_target < 0.05, (seg, w)
    assert abs(sum(by_seg.values()) - total_raw) < 1.0


def test_iqr_fences_replica(spark):
    """Quartiles and outlier counts recomputed from raw values must
    match; fences bracket the quartiles."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    vals = defaultdict(list)
    for r in ev:
        vals[r.event_type].append((r.value, r.event_id))
    rows = {r.event_type: r for r in _q(spark, "dq_outlier_iqr_fences").collect()}
    for ty, vs in vals.items():
        vs.sort()
        n = len(vs)
        q1 = vs[math.ceil(n * 0.25) - 1][0]
        q3 = vs[math.ceil(n * 0.75) - 1][0]
        r = rows[ty]
        assert r.n == n
        assert abs(r.q1 - math.floor(q1 * 1e4 + 0.5) / 1e4) < 1e-9
        assert abs(r.q3 - math.floor(q3 * 1e4 + 0.5) / 1e4) < 1e-9
        lo = q1 - 1.5 * (q3 - q1)
        hi = q3 + 1.5 * (q3 - q1)
        assert r.n_below == sum(1 for v, _ in vs if v < lo)
        assert r.n_above == sum(1 for v, _ in vs if v > hi)
        assert r.fence_lo <= r.q1 <= r.q3 <= r.fence_hi


def test_kfold_cv_covers_all_days(spark):
    """Across folds, per type, the test-day counts must sum to the full
    spine (every day held out exactly once); RMSE non-negative."""
    rows = _q(spark, "ml_kfold_cv_score").collect()
    by_type = defaultdict(int)
    for r in rows:
        assert r.rmse >= 0.0
        assert 0 <= r.fold < 5
        by_type[r.event_type] += r.n_test
    assert set(by_type.values()) == {30}
