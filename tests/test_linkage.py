"""Plan-shape and semantic tests for the linkage module (entity
resolution, attribution, changepoints, Theil-Sen, compaction planning,
cross-source overlap).

Correctness vs DuckDB is covered by the parametrized oracle suite
(test_oracle.py); these pin the SCALE-relevant plan shapes and the
operator-specific invariants an oracle diff can't see."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from conftest import SF_SMALL


def _plan(df) -> str:
    spark = df.sparkSession
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    return df._jdf.queryExecution().executedPlan().toString()


def test_er_pairs_are_joinless_and_oriented(spark):
    """ER candidate generation must be the in-row expansion (no self-join
    in the plan), every pair oriented pka < pkb within one block, and the
    reported distance must equal a reference Levenshtein."""
    from move_forecast_ind_spark.queries import REGISTRY

    df = REGISTRY["er_blocking_pairs"].fn(spark, SF_SMALL)
    assert "Join" not in _plan(df)
    rows = df.collect()
    assert rows

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in rows:
        assert r.pka < r.pkb
        assert r.dist <= 4
        assert r.name_a.split(" ")[0].lower() == r.blk
        assert r.name_b.split(" ")[0].lower() == r.blk
    # spot-check the edit distance on a handful of pairs
    for r in rows[:20]:
        assert r.dist == lev(r.name_a, r.name_b)


def test_cusum_matches_pure_python(spark):
    """The integer-scaled CUSUM argmax must equal an independent Python
    fold over the same daily series (exact, no float tolerance)."""
    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.sources import load_table

    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series: dict = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r["count"]))
    expected = {}
    for et, pts in series.items():
        pts.sort()
        n, tot = len(pts), sum(c for _, c in pts)
        cum, best = 0, None
        for idx, (day, c) in enumerate(pts, 1):
            cum += c
            s_scaled = n * cum - idx * tot
            key = (-abs(s_scaled), day)
            if best is None or key < best[0]:
                best = (key, day, abs(s_scaled), n)
        expected[et] = (best[1], best[2], best[3])
    got = {
        r.event_type: (r.cp_day, r.max_abs_s, r.n_days)
        for r in REGISTRY["ts_level_shift_by_type"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(expected)
    for et, (day, s_abs, n) in expected.items():
        gday, gmax, gn = got[et]
        assert (gday, gn) == (day, n)
        import math

        assert gmax == math.floor(s_abs / n * 1e4 + 0.5) / 1e4


def test_linear_attribution_conserves_credit(spark):
    """Linear multi-touch credit is conservative: every purchase hands
    out exactly 1.0 conversion credit (split over its touches, or all to
    'direct'), so channel credits must sum to the purchase count up to
    the per-channel rounding grid; revenue credits must likewise sum to
    total purchase revenue."""
    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.sources import load_table

    rows = REGISTRY["events_attribution_linear"].fn(spark, SF_SMALL).collect()
    assert {r.channel for r in rows} <= {"click", "view", "signup", "direct"}
    purch = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev"))
        .collect()[0]
    )
    assert abs(sum(r.credited_conversions for r in rows) - purch.n) < 1e-2
    assert abs(sum(r.credited_revenue for r in rows) - purch.rev) < 1e-1
    for r in rows:
        assert r.credited_conversions > 0


def test_compaction_plan_partitions_docs(spark):
    """The compaction plan must assign every doc exactly once (doc and
    char totals preserved), number files contiguously from 0 per source,
    and close every non-final file at-or-above the target (first-fit:
    a file only closes once its exclusive prefix crosses the target)."""
    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.queries.linkage import _COMPACT_TARGET_CHARS
    from move_forecast_ind_spark.sources import load_table

    rows = REGISTRY["s_compaction_plan"].fn(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    totals = {
        r.source: (r.n, r.chars)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        )
        .collect()
    }
    by_source: dict = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    assert set(by_source) == set(totals)
    for src, frs in by_source.items():
        frs.sort(key=lambda r: r.file_id)
        assert [r.file_id for r in frs] == list(range(len(frs)))
        assert sum(r.n_docs for r in frs) == totals[src][0]
        assert sum(r.total_chars for r in frs) == totals[src][1]
        # every file but the last must have reached the target size
        for r in frs[:-1]:
            assert r.total_chars >= _COMPACT_TARGET_CHARS - 0  # closed full


def test_theil_sen_matches_numpy_lower_median(spark):
    """The reported slope must equal the lower-median order statistic of
    the full pairwise-slope multiset, computed independently."""
    from move_forecast_ind_spark.queries import REGISTRY
    from move_forecast_ind_spark.sources import load_table

    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series: dict = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r["count"]))
    got = {
        r.event_type: (r.slope, r.n_pairs)
        for r in REGISTRY["a_theil_sen_slope"].fn(spark, SF_SMALL).collect()
    }
    import math

    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            (cb - ca) / (db - da).days
            for i, (da, ca) in enumerate(pts)
            for db, cb in pts[i + 1 :]
        )
        k = (len(slopes) + 1) // 2
        want = math.floor(slopes[k - 1] * 1e6 + 0.5) / 1e6
        assert got[et] == (want, len(slopes))


def test_source_overlap_bounds(spark):
    """Overlap counts must respect set algebra: n_common <= min(n_a, n_b)
    and 0 <= jaccard <= 1; the matrix covers every source pair that
    shares at least one bigram."""
    from move_forecast_ind_spark.queries import REGISTRY

    rows = REGISTRY["corpus_source_overlap"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= 1.0
