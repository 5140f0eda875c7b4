"""Invariant/replica tests for the round-7 continuation wave: spectral
entropy, schema drift, snapshot diff, PQ-ADC recall audit."""

from __future__ import annotations

import math
from collections import defaultdict

from conftest import SF_SMALL


def _q(spark, name):
    from move_forecast_ind_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF_SMALL)


def test_spectral_entropy_matches_periodogram(spark):
    """peak_power must equal the max power ts_periodogram emits for the
    same series (same grid, same rounding), entropy in [0,1], and
    forecastability its exact complement."""
    pg = defaultdict(dict)
    for r in _q(spark, "ts_periodogram").collect():
        pg[r.event_type][r.period_days] = r.power
    rows = _q(spark, "ts_spectral_entropy").collect()
    assert len(rows) == len(pg)
    for r in rows:
        powers = pg[r.event_type]
        assert r.n_periods == len(powers) == 13
        assert 2 <= r.peak_period <= 14
        mx = max(powers.values())
        assert abs(r.peak_power - mx) < 1e-9
        # argmax tie-break: smallest period among maxima
        assert r.peak_period == min(
            p for p, v in powers.items() if v == mx
        )
        assert 0.0 <= r.spectral_entropy <= 1.0 + 1e-9
        assert abs(r.forecastability - (1.0 - r.spectral_entropy)) < 2e-6


def test_spectral_entropy_replica(spark):
    """Entropy recomputed from the periodogram powers (same 1e2/1e9
    quantization pipeline) must match."""
    pg = defaultdict(dict)
    for r in _q(spark, "ts_periodogram").collect():
        pg[r.event_type][r.period_days] = r.power
    for r in _q(spark, "ts_spectral_entropy").collect():
        pq = {
            p: int(math.floor(v * 1e2 + 0.5))
            for p, v in pg[r.event_type].items()
        }
        tq = sum(pq.values())
        hq = sum(
            int(math.floor(-(q / tq) * math.log(q / tq) * 1e9 + 0.5))
            for q in pq.values()
            if q > 0
        )
        h = math.floor(hq / 1e9 / math.log(13) * 1e6 + 0.5) / 1e6
        assert abs(h - r.spectral_entropy) < 1e-9, r.event_type


def test_schema_drift_partitions_and_nulls(spark):
    """Era counts must partition the orders table per column, the
    fixture has no nulls, and NDV never exceeds rows."""
    from move_forecast_ind_spark.sources import load_table

    n = load_table(spark, SF_SMALL, "orders").count()
    rows = _q(spark, "dq_schema_drift").collect()
    assert {r.col_name for r in rows} == {
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
    }
    for r in rows:
        assert r.n_a + r.n_b == n
        assert r.null_a == r.null_b == 0
        assert r.null_rate_a == r.null_rate_b == 0.0
        assert 1 <= r.ndv_a <= r.n_a and 1 <= r.ndv_b <= r.n_b
        if r.col_name in ("o_orderstatus", "o_orderpriority"):
            assert r.mean_shift is None
        else:
            assert r.mean_shift is not None


def test_snapshot_diff_replica(spark):
    """Change-type counts and update magnitude recomputed in pure Python
    from raw orders must match exactly."""
    from move_forecast_ind_spark.sources import load_table

    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    counts = defaultdict(int)
    delta = defaultdict(int)
    for o in orders:
        k, p = o.o_orderkey, o.o_totalprice
        in1 = k % 7 != 0
        in2 = k % 11 != 3
        c1 = math.floor(p * 100 + 0.5)
        c2 = (
            math.floor(p * 1.1 * 100 + 0.5) if k % 5 == 0 else c1
        )
        if in1 and not in2:
            counts["delete"] += 1
        elif in2 and not in1:
            counts["insert"] += 1
        elif in1 and in2:
            if c1 != c2:
                counts["update"] += 1
                delta["update"] += abs(c2 - c1)
            else:
                counts["unchanged"] += 1
    rows = {r.change_type: r for r in _q(spark, "s_snapshot_diff").collect()}
    assert {k: v.n_keys for k, v in rows.items()} == dict(counts)
    assert rows["update"].price_delta_cents == delta["update"]
    assert rows["insert"].price_delta_cents == 0
    assert rows["delete"].price_delta_cents == 0


def test_pq_adc_exact_topk_replica(spark):
    """The exact-side top-k is verifiable from scratch: numpy recomputes
    each query's true top-10 by squared L2; the audit's n_overlap can
    never exceed k; recall is overlap/k; distortion >= 0. Also beats a
    size-matched random-overlap baseline on average (the codebook is
    seeded, not Lloyd-refined, so the bar is deliberately the random
    one, not a production recall floor)."""
    import numpy as np

    from move_forecast_ind_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb}
    ids = sorted(vecs)
    qids = ids[-8:]
    corpus = [i for i in ids if i < min(qids)]
    rows = {r.qid: r for r in _q(spark, "emb_pq_adc_recall").collect()}
    assert set(rows) == set(qids)
    k = 10
    for qid in qids:
        r = rows[qid]
        assert r.k == k and 0 <= r.n_overlap <= k
        assert abs(r.recall - r.n_overlap / k) < 1e-9
        assert r.mean_adc_distortion >= 0.0
    # replica of the exact ranking for one query (quantized + id tiebreak)
    q = vecs[qids[0]]
    scored = sorted(
        (int(math.floor(float(np.dot(q - vecs[c], q - vecs[c])) * 1e6 + 0.5)), c)
        for c in corpus
    )
    top = [c for _, c in scored[:k]]
    assert len(top) == k  # ranking well-defined; overlap uses this side
    n = len(corpus)
    random_overlap = k * k / n  # expected |A∩B| for independent k-sets
    mean_overlap = sum(r.n_overlap for r in rows.values()) / len(rows)
    assert mean_overlap >= min(random_overlap, k) * 0.3  # sanity, not quality


def test_wilson_interval_brackets_rate(spark):
    """Wilson bounds must bracket the point rate, stay inside [0,1],
    and be narrower than ±z/(2√n) + slack (sanity, not theory)."""
    rows = _q(spark, "events_wilson_ci").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        assert r.n_engaged <= r.n_users
        halfw = (r.wilson_hi - r.wilson_lo) / 2
        import math as _m

        assert halfw <= 1.96 / (2 * _m.sqrt(r.n_users)) + 1e-3


def test_tost_consistent_with_welch_shape(spark):
    """TOST internals: diff = mean_b - mean_a, t_lower/t_upper mirror
    around the margin, and the equivalence verdict matches recomputing
    the comparison from the emitted statistics."""
    r = _q(spark, "a_tost_equivalence").collect()[0]
    assert abs((r.mean_b - r.mean_a) - r.diff) < 1e-2
    assert r.margin > 0
    # t_lower + t_upper == 2*margin/se > 0; both finite
    assert r.t_lower + r.t_upper > 0
    z = 1.6448536269514722
    assert r.equivalent == (r.t_lower > z and r.t_upper > z)


def test_binseg_split_is_argmin(spark):
    """Brute-force SSE over every split in pure Python must agree with
    the emitted split and variance explained; variance_explained in
    [0, 1]; split partitions the series."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in _q(spark, "ts_changepoint_binseg").collect()}
    for ty, dd in daily.items():
        ys = [dd[d] for d in sorted(dd)]
        n = len(ys)

        def sse(seg):
            s = sum(seg)
            return sum(v * v for v in seg) - s * s / len(seg)

        total = sse(ys)
        best = min(
            (
                math.floor((sse(ys[:k]) + sse(ys[k:])) * 1e6 + 0.5),
                k,
            )
            for k in range(1, n)
        )
        r = rows[ty]
        assert r.n_before == best[1]
        assert r.n_before + r.n_after == n
        assert abs(r.sse_total - math.floor(total * 1e6 + 0.5) / 1e6) < 1e-6
        assert 0.0 <= r.variance_explained <= 1.0


def test_session_entropy_bounds_and_replica(spark):
    """Entropy per user recomputed from scratch must match; normalized
    entropy in [0,1]; single-type users emit NULL normalized."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r.user_id][r.event_type] += 1
    rows = {r.user_id: r for r in _q(spark, "events_session_entropy").collect()}
    assert set(rows) == set(counts)
    for u, cs in counts.items():
        total = sum(cs.values())
        hq = sum(
            math.floor(-(c / total) * math.log(c / total) * 1e9 + 0.5)
            for c in cs.values()
        )
        r = rows[u]
        assert r.n_events == total and r.n_types == len(cs)
        assert abs(r.entropy_nats - math.floor(hq / 1e9 * 1e6 + 0.5) / 1e6) < 1e-9
        if len(cs) == 1:
            assert r.entropy_normalized is None
        else:
            assert 0.0 <= r.entropy_normalized <= 1.0 + 1e-9


def test_centroid_drift_self_consistency(spark):
    """Centroid cosine in [-1, 1]; l2_drift >= 0 and zero iff the two
    quantized centroids coincide; era counts partition each label."""
    from move_forecast_ind_spark.sources import load_table

    n_by_label = defaultdict(int)
    for r in load_table(spark, SF_SMALL, "embeddings").select("label").collect():
        n_by_label[r.label] += 1
    rows = _q(spark, "emb_centroid_drift").collect()
    for r in rows:
        assert r.n_era0 + r.n_era1 == n_by_label[r.label]
        assert -1.0 <= r.centroid_cosine <= 1.0 + 1e-9
        assert r.l2_drift >= 0.0
        if r.l2_drift == 0.0:
            assert r.centroid_cosine > 0.999999


def test_ljung_box_replica(spark):
    """Q recomputed from scratch (same quantized-term pipeline) must
    match; Q >= 0; verdict consistent with the critical value."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in _q(spark, "ts_ljung_box").collect()}
    for ty, dd in daily.items():
        ys = [dd[d] for d in sorted(dd)]
        n = len(ys)
        sy = sum(ys)
        ybar = sy / n
        c0 = sum(y * y for y in ys) - ybar * (sy + sy) + n * ybar * ybar
        tq = 0
        for k in range(1, 8):
            sab = sum(ys[i] * ys[i - k] for i in range(k, n))
            sa, sb = sum(ys[k:]), sum(ys[: n - k])
            ckv = sab - ybar * (sa + sb) + (n - k) * ybar * ybar
            rk = ckv / c0
            tq += math.floor(rk * rk / (n - k) * 1e12 + 0.5)
        q = n * (n + 2) * (tq / 1e12)
        r = rows[ty]
        assert r.n == n and r.df == 7
        assert abs(r.q_stat - math.floor(q * 1e4 + 0.5) / 1e4) < 1e-9
        assert r.q_stat >= 0.0
        assert r.reject_whiteness == (q > 14.067140449340169)


def test_lorenz_curve_monotone_convex(spark):
    """Cumulative shares are monotone, end at 1.0, and the curve sits
    below the diagonal (value share <= population share everywhere for
    an ascending-sorted Lorenz curve)."""
    rows = sorted(_q(spark, "events_lorenz_curve").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    prev_p = prev_v = 0.0
    for r in rows:
        assert r.cum_pop_share >= prev_p and r.cum_value_share >= prev_v
        assert r.cum_value_share <= r.cum_pop_share + 1e-9
        prev_p, prev_v = r.cum_pop_share, r.cum_value_share
    assert abs(rows[-1].cum_pop_share - 1.0) < 1e-9
    assert abs(rows[-1].cum_value_share - 1.0) < 1e-9


def test_overdispersion_replica(spark):
    """Mean/variance/D recomputed from the daily series must match;
    dispersion index positive."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.ts.date()] += 1
    rows = {r.event_type: r for r in _q(spark, "ts_overdispersion").collect()}
    for ty, dd in daily.items():
        ys = [dd[d] for d in sorted(dd)]
        n = len(ys)
        mean = sum(ys) / n
        var = (sum(y * y for y in ys) - sum(ys) ** 2 / n) / (n - 1)
        r = rows[ty]
        assert r.n == n
        assert abs(r.mean - math.floor(mean * 1e4 + 0.5) / 1e4) < 1e-9
        assert abs(r.variance - math.floor(var * 1e4 + 0.5) / 1e4) < 1e-9
        assert r.dispersion_index > 0


def test_pattern_census_shares_and_patterns(spark):
    """Every pattern uses only the class alphabet; shares per column sum
    to <= 1 (top-5 cut); the customer-name pattern is the expected
    'Aaaaaaaa#999999999' skeleton."""
    rows = _q(spark, "dq_pattern_census").collect()
    by_col = defaultdict(list)
    for r in rows:
        by_col[r.col_name].append(r)
        assert r.rk <= 5 and r.n > 0
        assert all(ch in "Aa9#_-. " for ch in r.pattern), r.pattern
    assert sum(r.share for r in by_col["c_name"]) <= 1.0 + 1e-6
    top_name = max(by_col["c_name"], key=lambda r: r.n)
    assert top_name.pattern == "Aaaaaaaa#999999999"


def test_brier_decomposition_identity(spark):
    """Brier must match ml_classifier_auc's brier to the shared grid;
    the 3-term Murphy identity holds up to the emitted residual; all
    components non-negative (uncertainty, reliability, resolution)."""
    rows = _q(spark, "ml_brier_decomposition").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9
    lhs = r.brier
    rhs = r.reliability - r.resolution + r.uncertainty + r.residual
    assert abs(lhs - rhs) < 5e-6
    auc_rows = _q(spark, "ml_classifier_auc").collect()
    brier_cols = [c for c in auc_rows[0].asDict() if "brier" in c]
    if brier_cols:
        assert abs(auc_rows[0][brier_cols[0]] - r.brier) < 1e-3


def test_markov_stationary_is_distribution(spark):
    """pi sums to 1 (grid slack), every component nonnegative, and pi is
    approximately invariant: |pi P - pi| small after 15 rounds."""
    from move_forecast_ind_spark.sources import load_table

    rows = {r.state: r for r in _q(spark, "events_markov_stationary").collect()}
    assert abs(sum(r.pi for r in rows.values()) - 1.0) < 1e-3
    assert all(r.pi >= 0 for r in rows.values())
    ev = load_table(spark, SF_SMALL, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    sts = ("click", "error", "purchase", "signup", "view")
    cnt = defaultdict(int)
    out = defaultdict(int)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rs, rs[1:]):
            out[a.event_type] += 1
            cnt[(a.event_type, b.event_type)] += 1
    p = {
        (f, t): cnt[(f, t)] / max(out[f], 1) for f in sts for t in sts
    }
    pi = {s: rows[s].pi for s in sts}
    for t in sts:
        nxt = sum(pi[f] * p[(f, t)] for f in sts)
        assert abs(nxt - pi[t]) < 5e-3, (t, nxt, pi[t])


def test_order_total_consistency_covers_orders(spark):
    """Status counts partition the orders table; TPC-H-style fixtures
    should reconcile (mismatch bucket absent or tiny)."""
    from move_forecast_ind_spark.sources import load_table

    n = load_table(spark, SF_SMALL, "orders").count()
    rows = {r.status: r for r in _q(spark, "dq_order_total_consistency").collect()}
    assert sum(r.n_orders for r in rows.values()) == n
    assert "consistent" in rows or "mismatch" in rows
    for r in rows.values():
        assert r.max_abs_diff_cents <= r.total_abs_diff_cents or r.n_orders == 0


def test_seasonal_indices_normalized(spark):
    """Per series the seven seasonal indices average 1.0; raw vs
    normalized differ by exactly the per-series normalizer; indices
    positive."""
    rows = _q(spark, "ts_seasonal_indices").collect()
    by_type = defaultdict(list)
    for r in rows:
        assert r.seasonal_index > 0 and r.raw_index > 0
        by_type[r.event_type].append(r)
    for ty, rs in by_type.items():
        assert len(rs) == 7
        assert abs(sum(r.seasonal_index for r in rs) / 7 - 1.0) < 1e-4, ty
        ratio = {round(r.raw_index / r.seasonal_index, 4) for r in rs}
        assert max(ratio) - min(ratio) < 1e-3  # one shared normalizer


def test_asof_tolerance_replica(spark):
    """Matched/gap recomputed from a per-user replay must agree; every
    matched gap within tolerance; purchases with a recent click are
    matched."""
    from move_forecast_ind_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    expect = {}
    tol = 3600 * 1_000_000
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (int(r.ts.timestamp() * 1e6), r.event_id))
        last_click = None
        for r in rs:
            us = int(r.ts.timestamp() * 1e6)
            if r.event_type == "purchase":
                if last_click is not None and us - last_click <= tol:
                    expect[r.event_id] = us - last_click
                else:
                    expect[r.event_id] = None
            if r.event_type == "click":
                last_click = us
    rows = _q(spark, "j_asof_tolerance_join").collect()
    assert {r.purchase_id for r in rows} == set(expect)
    for r in rows:
        want = expect[r.purchase_id]
        assert r.matched == (want is not None)
        assert r.gap_us == want
        if r.matched:
            assert 0 <= r.gap_us <= tol


def test_lang_confusion_diag_dominates(spark):
    """Row shares per declared language sum to 1; confusion cells cover
    every document; diagonal agreement matches text_langid's output."""
    rows = _q(spark, "dq_lang_confusion").collect()
    by_lab = defaultdict(list)
    total = 0
    for r in rows:
        by_lab[r.labeled_lang].append(r)
        total += r.n
        assert r.is_correct == (r.labeled_lang == r.guessed_lang)
    from move_forecast_ind_spark.sources import load_table

    assert total == load_table(spark, SF_SMALL, "documents").count()
    for lab, rs in by_lab.items():
        assert abs(sum(r.row_share for r in rs) - 1.0) < 1e-4
    li = _q(spark, "text_langid").collect()
    agree = sum(1 for r in li if r.labeled_lang == r.guessed_lang)
    diag = sum(r.n for r in rows if r.is_correct)
    assert diag == agree


def test_triplet_audit_random_embeddings_near_half(spark):
    """Violation rate in [0,1]; for these near-random embeddings the
    pooled rate sits in a wide band around 0.5; margins finite."""
    rows = _q(spark, "emb_triplet_margin_audit").collect()
    assert rows
    tot = sum(r.n_triplets for r in rows)
    viol = sum(r.n_violations for r in rows)
    for r in rows:
        assert 0 <= r.n_violations <= r.n_triplets
        assert 0.0 <= r.violation_rate <= 1.0
    assert 0.2 <= viol / tot <= 0.8


def test_conversion_cdf_monotone(spark):
    """n_within nondecreasing in the checkpoint; shares in [0,1];
    terminal checkpoint (7 d) captures every conversion whose lag fits
    the 30-day window's tail; consistency with events_conversion_lag's
    population."""
    rows = sorted(
        _q(spark, "w_conversion_time_cdf").collect(),
        key=lambda r: r.checkpoint_minutes,
    )
    assert [r.checkpoint_minutes for r in rows] == [5, 30, 60, 360, 1440, 10080]
    prev = -1
    for r in rows:
        assert r.n_within >= prev
        prev = r.n_within
        assert 0.0 <= r.share_of_conversions <= 1.0
        assert 0.0 <= r.share_of_clickers <= r.share_of_conversions + 1e-9
        assert r.n_converted <= r.n_clickers


def test_mcnemar_cells_partition(spark):
    """The four cells partition the eval set; verdict recomputable from
    the discordant cells."""
    r = _q(spark, "ml_mcnemar_paired").collect()[0]
    assert r.n_both + r.n_a_only + r.n_b_only + r.n_neither == r.n
    b, c = r.n_a_only, r.n_b_only
    stat = (abs(b - c) - 1.0) ** 2 / max(b + c, 1)
    assert abs(r.chi_square - math.floor(stat * 1e4 + 0.5) / 1e4) < 1e-9
    assert r.significant == (stat > 3.841458820694124)
