"""Invariant and replica tests for the evaluation module (rank stats,
ANOVA, BH-FDR, privacy, NDCG, threshold sweep, pinball, RAKE,
Davies-Bouldin, assortativity, manifest pruning, Kalman, Mann-Kendall,
JL projection, LSH candidate audit).

Correctness vs DuckDB is covered by the parametrized oracle suite
(test_oracle.py); these pin operator-specific mathematical invariants and
pure-Python replicas an oracle diff can't see (the oracle could be wrong
the same way the query is — a replica can't)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from conftest import SF_SMALL


def _q(spark, name):
    from move_forecast_ind_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, SF_SMALL)


# --- Spearman ----------------------------------------------------------------


def test_spearman_matches_python_replica(spark):
    """rho per segment must equal a from-scratch Python average-rank
    Spearman on the same cents-quantized inputs."""
    from move_forecast_ind_spark.sources import load_table

    cust = load_table(spark, SF_SMALL, "customer").collect()
    orders = load_table(spark, SF_SMALL, "orders").collect()
    spend = defaultdict(int)
    for o in orders:
        spend[o.o_custkey] += int(math.floor(o.o_totalprice * 100 + 0.5))
    segs = defaultdict(list)
    for c in cust:
        segs[c.c_mktsegment].append(
            (int(math.floor(c.c_acctbal * 100 + 0.5)), spend.get(c.c_custkey, 0))
        )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    expected = {}
    for seg, pairs in segs.items():
        xs = avg_ranks([p[0] for p in pairs])
        ys = avg_ranks([p[1] for p in pairs])
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        vx = sum((a - mx) ** 2 for a in xs)
        vy = sum((b - my) ** 2 for b in ys)
        expected[seg] = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else None

    for r in _q(spark, "a_spearman_rank").collect():
        e = expected[r.c_mktsegment]
        assert e is not None and abs(r.rho_spearman - e) < 1e-4, (
            r.c_mktsegment,
            r.rho_spearman,
            e,
        )


# --- ANOVA -------------------------------------------------------------------


def test_anova_decomposition_and_bounds(spark):
    rows = _q(spark, "a_anova_dow_f").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 7
    assert r.f_stat >= 0.0
    assert 0.0 <= r.eta_squared <= 1.0
    # SST = SSB + SSW up to the two r4 grids
    assert r.ss_between >= 0.0 and r.ss_within > 0.0
    assert abs(
        r.eta_squared - r.ss_between / (r.ss_between + r.ss_within)
    ) < 1e-4


# --- l-diversity -------------------------------------------------------------


def test_l_diversity_bounds(spark):
    for r in _q(spark, "dq_l_diversity").collect():
        assert 1 <= r.l_distinct <= 5  # five market segments exist
        # entropy-l is <= distinct-l (uniform maximizes entropy) and >= 1
        assert 1.0 - 1e-9 <= r.entropy_l <= r.l_distinct + 1e-6
        assert r.l_diverse == (r.l_distinct >= 3)
        assert r.n >= r.l_distinct


# --- threshold sweep ---------------------------------------------------------


def test_threshold_sweep_monotone_and_consistent(spark):
    rows = sorted(
        _q(spark, "ml_threshold_sweep").collect(), key=lambda r: r.threshold
    )
    assert len(rows) == 9
    n = rows[0].tp + rows[0].fp + rows[0].fn + rows[0].tn
    n_pos = rows[0].tp + rows[0].fn
    prev_rec = 2.0
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n
        assert r.tp + r.fn == n_pos  # positives invariant across thresholds
        rec = r.recall_ if r.recall_ is not None else 0.0
        assert rec <= prev_rec + 1e-12  # recall non-increasing in threshold
        prev_rec = rec
        if r.f1 is not None and r.precision_ and r.recall_:
            hm = 2 * r.precision_ * r.recall_ / (r.precision_ + r.recall_)
            assert abs(r.f1 - hm) < 1e-4


# --- NDCG --------------------------------------------------------------------


def test_ndcg_bounds(spark):
    rows = _q(spark, "ml_ndcg_eval").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9
        assert 0 <= r.n_rel_in_k <= 10


# --- pinball -----------------------------------------------------------------


def test_pinball_coverage_monotone(spark):
    rows = sorted(
        _q(spark, "ml_pinball_loss").collect(), key=lambda r: r.quantile
    )
    assert [r.quantile for r in rows] == [0.1, 0.5, 0.9]
    assert all(r.mean_pinball >= 0.0 for r in rows)
    # a higher quantile forecast can only cover more test days
    assert rows[0].coverage <= rows[1].coverage <= rows[2].coverage
    assert all(0.0 <= r.coverage <= 1.0 for r in rows)


# --- RAKE --------------------------------------------------------------------


def test_rake_phrases_have_no_stopwords_and_plen_matches(spark):
    from move_forecast_ind_spark.queries.evaluation import _RAKE_STOPS

    per_doc = Counter()
    for r in _q(spark, "text_rake_keywords").collect():
        words = r.phrase.split(" ")
        assert len(words) == r.plen
        assert not set(words) & set(_RAKE_STOPS), r.phrase
        assert 1 <= r.rnk <= 3
        per_doc[r.doc_id] += 1
    assert max(per_doc.values()) <= 3


# --- Davies-Bouldin ----------------------------------------------------------


def test_davies_bouldin_index_is_mean_of_terms(spark):
    rows = _q(spark, "emb_davies_bouldin").collect()
    assert len(rows) == 10  # ten labels in the fixture
    mean_term = sum(r.db_term for r in rows) / len(rows)
    for r in rows:
        assert r.s_scatter > 0.0 and r.db_term > 0.0
        assert abs(r.db_index - mean_term) < 1e-4


# --- BH-FDR ------------------------------------------------------------------


def test_bh_stepup_property(spark):
    rows = sorted(
        _q(spark, "a_benjamini_hochberg").collect(), key=lambda r: r.bh_rank
    )
    assert len(rows) == 25
    m = len(rows)
    # p sorted by rank; critical ladder correct; discoveries = prefix up to
    # the LAST passing rank (step-up, not step-down)
    passing = [r.bh_rank for r in rows if r.p_value <= r.bh_critical]
    k = max(passing) if passing else 0
    for i, r in enumerate(rows):
        if i:
            assert r.p_value >= rows[i - 1].p_value - 1e-12
        assert abs(r.bh_critical - r.bh_rank / m * 0.1) < 1e-6
        assert r.discovery == (r.bh_rank <= k)


# --- degree assortativity ----------------------------------------------------


def test_assortativity_in_valid_range(spark):
    r = _q(spark, "events_degree_assortativity").collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


# --- manifest pruning --------------------------------------------------------


def test_sorted_layout_never_scans_more_than_random(spark):
    rows = _q(spark, "s_manifest_prune_stats").collect()
    by_q = defaultdict(dict)
    for r in rows:
        by_q[r.q_id][r.layout] = r
    assert set(by_q) == {"q_week", "q_month", "q_year"}
    for q, d in by_q.items():
        assert d["sorted"].rows_scanned <= d["random"].rows_scanned
        assert d["sorted"].files_scanned <= d["random"].files_scanned
        # manifests can only OVERSCAN, never underscan
        for r in d.values():
            assert r.rows_scanned >= r.rows_matching
            assert r.scan_amplification >= 1.0
        # the point of the operator: selective queries prune hard on sort
        assert d["sorted"].files_scanned < d["random"].files_scanned


# --- Kalman ------------------------------------------------------------------


def test_kalman_matches_python_recursion(spark):
    from move_forecast_ind_spark.queries.evaluation import _KAL_Q, _KAL_R

    rows = sorted(_q(spark, "ts_kalman_level").collect(), key=lambda r: r.day)
    x, p = float(rows[0].y), _KAL_R
    assert rows[0].level == x and rows[0].gain == 1.0
    for r in rows[1:]:
        pp = p + _KAL_Q
        k = pp / (pp + _KAL_R)
        x = x + k * (r.y - x)
        p = (1.0 - k) * pp
        assert abs(r.level - x) < 1e-5 and abs(r.gain - k) < 1e-5
    # gains decay monotonically toward the steady state from the k=1 start
    gains = [r.gain for r in rows]
    assert all(g2 <= g1 + 1e-9 for g1, g2 in zip(gains, gains[1:]))


# --- Mann-Kendall ------------------------------------------------------------


def test_mann_kendall_s_matches_bruteforce(spark):
    from move_forecast_ind_spark.sources import load_table
    import pyspark.sql.functions as F

    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.y))
    expected = {}
    for t, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        expected[t] = (len(ys), s)
    for r in _q(spark, "ts_mann_kendall").collect():
        n, s = expected[r.event_type]
        assert (r.n, r.s_stat) == (n, s)
        assert 0.0 <= r.p_value <= 1.0 + 1e-9
        assert r.trend == (
            "increasing" if s > 0 else "decreasing" if s < 0 else "no_trend"
        )


# --- JL projection -----------------------------------------------------------


def test_jl_distortion_concentrates_near_one(spark):
    rows = _q(spark, "emb_random_projection").collect()
    assert len(rows) == 190  # C(20, 2)
    ds = [r.distortion for r in rows if r.distortion is not None]
    assert ds, "all original distances were zero?"
    mean = sum(ds) / len(ds)
    # 16-dim sign projection: E[ratio^2] = 1, sd of ratio ~ 1/sqrt(8);
    # loose fences that still catch a broken sign matrix or scale factor
    assert 0.8 < mean < 1.2, mean
    assert all(0.3 < d < 2.0 for d in ds)


# --- LSH candidate audit -----------------------------------------------------


def test_lsh_candidate_eval_consistency(spark):
    r = _q(spark, "dedup_lsh_candidate_eval").collect()[0]
    assert r.n_hits <= min(r.n_truth, r.n_candidates)
    if r.n_truth:
        assert abs(r.recall - r.n_hits / r.n_truth) < 1e-6
        # banding r=2 b=8 at the 0.5 truth threshold predicts >= 0.90
        # expected recall; the fixture's true pairs are far above the
        # threshold, so demand a high floor
        assert r.recall >= 0.8
    if r.n_candidates:
        assert abs(r.precision_ - r.n_hits / r.n_candidates) < 1e-6


# --- banded value join -------------------------------------------------------


def test_band_join_is_broadcast_hash_not_cartesian(spark):
    df = _q(spark, "j_value_band_join")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    from move_forecast_ind_spark.queries.joins import _BAND_CENTS

    for r in df.collect():
        assert abs(r.diff_cents) <= _BAND_CENTS


# --- Hodges-Lehmann ----------------------------------------------------------


def test_hodges_lehmann_matches_python(spark):
    from move_forecast_ind_spark.sources import load_table
    import pyspark.sql.functions as F

    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append(r.y)
    for r in _q(spark, "a_hodges_lehmann").collect():
        ys = sorted(series[r.event_type])
        walsh = sorted(
            ys[i] + ys[j] for i in range(len(ys)) for j in range(i, len(ys))
        )
        assert r.n_pairs == len(walsh) == len(ys) * (len(ys) + 1) // 2
        assert r.hl_estimate == walsh[(len(walsh) + 1) // 2 - 1] / 2.0


# --- rolling median ----------------------------------------------------------


def test_rolling_median_window_bounds(spark):
    rows = _q(spark, "w_rolling_median").collect()
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        series[r.event_type].append(r)
    for t, rs in series.items():
        for i, r in enumerate(rs):
            assert r.n_window == min(i + 1, 7)
            window = sorted(x.y for x in rs[max(0, i - 6) : i + 1])
            assert r.rolling_median == window[(len(window) + 1) // 2 - 1]


def test_textrank_replica_and_ranks(spark):
    """TextRank output recomputed from scratch in pure Python (token
    stream -> vocab fence -> symmetric adjacency -> 8 quantized
    PageRank rounds) must match word-for-word; ranks positive and
    sorted; words come from the non-stopword vocabulary."""
    import math
    from collections import defaultdict

    from conftest import SF_SMALL
    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.sources import load_table

    stops = {"the", "and", "of", "is", "a"}
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    cnt = defaultdict(int)
    adj = defaultdict(int)
    tokss = []
    for d in docs:
        ws = [w.lower() for w in d.text.strip().split()]
        tokss.append(ws)
        for w in ws:
            if w not in stops:
                cnt[w] += 1
    vocab = sorted(cnt, key=lambda t: (-cnt[t], t))[:120]
    vset = set(vocab)
    for ws in tokss:
        for a, b in zip(ws, ws[1:]):
            if a in vset and b in vset and a != b:
                adj[(a, b)] += 1
                adj[(b, a)] += 1
    outw = defaultdict(int)
    for (s, d2), w in adj.items():
        outw[s] += w
    n = len(vocab)
    rq = {t: math.floor(1e9 / n + 0.5) for t in vocab}
    for _ in range(8):
        sq = {t: 0 for t in vocab}
        for (s, d2), w in adj.items():
            sq[d2] += math.floor(float(w * rq[s]) / outw[s] + 0.5)
        rq = {
            t: math.floor(0.15 * 1e9 / n + 0.85 * sq[t] + 0.5) for t in vocab
        }
    top = sorted(vocab, key=lambda t: (-rq[t], t))[:15]
    rows = REGISTRY["text_textrank_keywords"].fn(spark, SF_SMALL).collect()
    assert [r.word for r in rows] == top
    for r in rows:
        assert r.word not in stops
        assert r.rank > 0
        assert r.n_count == cnt[r.word]
        assert abs(r.rank - math.floor(rq[r.word] / 1e9 * 1e6 + 0.5) / 1e6) < 1e-9


def test_distributed_ntile_matches_builtin(spark):
    """s_manifest_prune_stats (r14) replaces the single-partition global
    ntile() window with per-group row_number + cumulative offsets + NTILE's
    bucket-assignment arithmetic. Pin that the arithmetic matches the
    builtin bit-for-bit, remainder buckets included, on sizes around the
    bucket count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for n, nf in [(10, 4), (23, 24), (24, 24), (25, 24), (600, 24), (7, 3)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        real = df.withColumn("t", F.ntile(nf).over(Window.orderBy("rn")) - 1)
        formula = df.crossJoin(
            F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
        ).select(
            "rn",
            F.expr(
                f"CASE WHEN __n % {nf} > 0 "
                f"      AND rn <= (__n % {nf}) * (__n div {nf} + 1) "
                f"     THEN (rn - 1) div (__n div {nf} + 1) + 1 "
                f"     ELSE __n % {nf} "
                f"          + (rn - (__n % {nf}) * (__n div {nf} + 1) - 1) "
                f"            div (__n div {nf}) + 1 END - 1"
            ).alias("t2"),
        )
        bad = (
            real.join(formula, "rn").filter("t <> t2").count()
        )
        assert bad == 0, f"n={n} nf={nf}: distributed ntile diverged"
