"""Forecasting-path queries (SURVEY.md §2.9, milestone M3).

Two tiers:

- ``ml_linreg_forecast`` — per-branch linear-trend forecast using the
  built-in ``regr_slope``/``regr_intercept`` aggregates. Fully
  SQL-expressible, so the DuckDB oracle hash-checks it (the closest an ML
  path gets to the driver's strong gate).
- ``ml_train_fourier`` / ``ml_forecast_fourier`` — the real surrogate
  model (trend + yearly/weekly Fourier, OLS per branch via applyInPandas;
  plans.training). Deterministic but not ANSI-SQL-expressible → rows-only
  contract; pytest asserts determinism and shape instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import r4, r6, sql_r4
from ..plans.training import (
    EPOCH,
    MIN_OBS_Q,
    T_SCALE,
    Z80,
    fourier_freqs,
    n_features,
    score,
    train_models,
    train_models_q,
)
from ..session import tune
from ..sources import load_table
from .registry import fmt_doc, register

CUTOFF = "1998-12-31"  # train ≤ cutoff (analog of reference pretrain_models.py:20)


def _fourier_feature_sql() -> list[str]:
    """Per-index SQL feature expressions, same order and same float
    literals (repr round-trips the exact double) as plans.training's
    _feature_matrix / feature_expr."""
    feats = ["1e0", f"t / {T_SCALE!r}"]
    for w in fourier_freqs():
        feats.append(f"sin(t * {w!r})")
        feats.append(f"cos(t * {w!r})")
    return feats


def _fourier_model_ctes(min_obs: int = MIN_OBS_Q) -> str:
    """The DuckDB twin of plans.training.train_models_q, as a CTE chain
    ending in ``fmodels(branch, c1..c12, sigma, n_obs)``:

    integer fixed-point design (features ×1e6, y ×1e3) → exact integer
    normal-equation moments (order-free sums) → the SAME unpivoted
    Gauss-Jordan elimination train_models_q runs in Python, unrolled as
    one CTE per pivot with the identical expression
    ``v - v_ik * v_kj / v_kk`` — identical integer inputs + identical
    IEEE op sequence = bit-identical coefficients on both engines. This is
    the same fixed-point-oracle doctrine as ml_pca_power_iteration
    (queries/analytics.py), applied to a linear solve instead of an
    eigen-iteration."""
    p = n_features()
    case = (
        "CASE r.i "
        + " ".join(
            f"WHEN {i + 1} THEN {e}"
            for i, e in enumerate(_fourier_feature_sql())
        )
        + " END"
    )
    parts = [
        f"""
    fdaily AS MATERIALIZED (
      SELECT l_suppkey AS branch, CAST(l_shipdate AS DATE) AS ds,
             SUM(l_quantity) AS y
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '{CUTOFF}'
      GROUP BY 1, 2
    ),
    ftbl AS MATERIALIZED (
      SELECT d.branch, d.ds,
             CAST(date_diff('day', DATE '{EPOCH}', d.ds) AS DOUBLE) AS t,
             CAST(FLOOR(d.y * 1e3 + 0.5) AS BIGINT) AS yq
      FROM fdaily d
      JOIN (SELECT branch FROM fdaily GROUP BY 1
            HAVING COUNT(*) >= {min_obs}) k USING (branch)
    ),
    ffeat AS MATERIALIZED (
      SELECT f.branch, f.ds, f.yq, r.i,
             CAST(FLOOR(({case}) * 1e6 + 0.5) AS BIGINT) AS fq
      FROM ftbl f CROSS JOIN range(1, {p + 1}) r(i)
    ),
    fxtx AS MATERIALIZED (
      SELECT a.branch, a.i AS i, b.i AS j, SUM(a.fq * b.fq) AS m
      FROM ffeat a JOIN ffeat b ON a.branch = b.branch AND a.ds = b.ds
      GROUP BY 1, 2, 3
    ),
    fxty AS MATERIALIZED (
      SELECT branch, i, SUM(fq * yq) AS s FROM ffeat GROUP BY 1, 2
    ),
    fstat AS (
      SELECT branch, CAST(COUNT(*) AS BIGINT) AS n_obs, SUM(yq * yq) AS yty
      FROM ftbl GROUP BY 1
    ),
    fm0 AS (
      SELECT branch, i, j, CAST(m AS DOUBLE) AS v FROM fxtx
      UNION ALL
      SELECT branch, i, {p + 1} AS j, CAST(s AS DOUBLE) AS v FROM fxty
    )"""
    ]
    for k in range(1, p + 1):
        parts.append(
            f""",
    fm{k} AS MATERIALIZED (
      SELECT m.branch, m.i, m.j,
             CASE WHEN m.i = {k} THEN m.v
                  ELSE m.v - pc.v * pr.v / pv.v END AS v
      FROM fm{k - 1} m
      JOIN (SELECT branch, j, v FROM fm{k - 1} WHERE i = {k}) pr
        ON pr.branch = m.branch AND pr.j = m.j
      JOIN (SELECT branch, i, v FROM fm{k - 1} WHERE j = {k}) pc
        ON pc.branch = m.branch AND pc.i = m.i
      JOIN (SELECT branch, v FROM fm{k - 1} WHERE i = {k} AND j = {k}) pv
        ON pv.branch = m.branch
    )"""
        )
    beta_cols = ", ".join(
        f"MAX(CASE WHEN i = {i} THEN c END) AS c{i}" for i in range(1, p + 1)
    )
    parts.append(
        f""",
    fbint AS MATERIALIZED (
      SELECT b.branch, b.i, b.v / d.v AS b
      FROM (SELECT branch, i, v FROM fm{p} WHERE j = {p + 1}) b
      JOIN (SELECT branch, i, v FROM fm{p} WHERE i = j) d
        ON d.branch = b.branch AND d.i = b.i
    ),
    fbeta AS (
      SELECT branch, i, b * 1e3 AS c FROM fbint
    ),
    fsig AS (
      -- NOTE: unlike the Gauss-Jordan solve above (fixed op order, hence
      -- bit-for-bit), the lin/quad terms here are unordered SUMs whose
      -- accumulation order DuckDB does not fix; sigma matches the Spark
      -- side because both are absorbed by the 1e-4 rounding grid, not
      -- because the IEEE op sequence is identical.
      SELECT s.branch, s.n_obs,
             sqrt(GREATEST(CAST(s.yty AS DOUBLE) - 2e0 * l.l + q.q, 0e0)
                  / 1e6 / GREATEST(s.n_obs - {p}, 1)) AS sigma
      FROM fstat s
      JOIN (SELECT t.branch, SUM(CAST(t.s AS DOUBLE) * b.b) AS l
            FROM fxty t JOIN fbint b ON b.branch = t.branch AND b.i = t.i
            GROUP BY 1) l ON l.branch = s.branch
      JOIN (SELECT x.branch, SUM(CAST(x.m AS DOUBLE) * ba.b * bb.b) AS q
            FROM fxtx x
            JOIN fbint ba ON ba.branch = x.branch AND ba.i = x.i
            JOIN fbint bb ON bb.branch = x.branch AND bb.i = x.j
            GROUP BY 1) q ON q.branch = s.branch
    ),
    fmodels AS MATERIALIZED (
      SELECT b.branch, {beta_cols}, MIN(s.sigma) AS sigma, MIN(s.n_obs) AS n_obs
      FROM fbeta b JOIN fsig s ON s.branch = b.branch
      GROUP BY b.branch
    )"""
    )
    return "".join(parts)


def _fourier_dot_sql(prefix: str = "m") -> str:
    """Explicit left-associated dot product matching score()'s fold order:
    ((0 + c1*f1) + c2*f2) + ... — bit-compatible with F.aggregate."""
    terms = " + ".join(
        f"{prefix}.c{i + 1} * ({e})"
        for i, e in enumerate(_fourier_feature_sql())
    )
    return f"0e0 + {terms}"


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: daily per-branch totals (reference pretrain_models.py:13)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_suppkey").alias("branch"),
            F.col("l_shipdate").cast("date").alias("ds"),
        )
        .agg(F.sum("l_quantity").alias("y"))
    )


def _future_frame(spark: SparkSession, start: str, end: str, n_branches: int = 10):
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("ds")
    )
    return (
        spark.range(1, n_branches + 1)
        .select(F.col("id").alias("branch"))
        .crossJoin(days)
    )


@register(
    "ml_linreg_forecast",
    bench=True,
    tags=("ml", "aggregate"),
    oracle=f"""
    WITH daily AS (
      SELECT l_suppkey AS branch,
             CAST(l_shipdate AS DATE) AS ds,
             SUM(l_quantity) AS y
      FROM lineitem
      GROUP BY 1, 2
    ),
    fits AS (
      SELECT branch,
             regr_slope(y, datediff('day', DATE '1995-01-01', ds))     AS slope,
             regr_intercept(y, datediff('day', DATE '1995-01-01', ds)) AS icept,
             CAST(COUNT(*) AS BIGINT)                                  AS n_obs
      FROM daily
      WHERE ds <= DATE '{CUTOFF}'
      GROUP BY 1
      HAVING COUNT(*) >= 2
    ),
    future AS (
      SELECT unnest(generate_series(DATE '1999-06-01', DATE '1999-06-07',
                                    INTERVAL 1 DAY)) AS ds
    )
    SELECT f.branch,
           CAST(fu.ds AS DATE) AS ds,
           {sql_r4("f.icept + f.slope * datediff('day', DATE '1995-01-01', CAST(fu.ds AS DATE))")} AS yhat,
           CAST(FLOOR(GREATEST(
                 f.icept + f.slope * datediff('day', DATE '1995-01-01', CAST(fu.ds AS DATE)),
                 0e0) + 0.5) AS BIGINT) AS count,
           f.n_obs
    FROM fits f
    CROSS JOIN future fu
    WHERE f.branch BETWEEN 1 AND 10
    """,
)
def ml_linreg_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-branch OLS trend via built-in regression aggregates: the training
    'loop' is one grouped aggregate (110 groups in parallel), scoring is a
    cross join with the 7-day future frame — end-to-end relational, so the
    oracle hash-checks the entire forecast."""
    tune(spark)
    from ..functions.rounding import round_count

    daily = _daily_series(spark, sf_dir)
    t = F.datediff(F.col("ds"), F.lit("1995-01-01").cast("date"))
    fits = (
        daily.filter(F.col("ds") <= F.lit(CUTOFF).cast("date"))
        .groupBy("branch")
        .agg(
            F.regr_slope(F.col("y"), t.cast("double")).alias("slope"),
            F.regr_intercept(F.col("y"), t.cast("double")).alias("icept"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .filter((F.col("n_obs") >= 2) & (F.col("branch") <= 10))
    )
    future = _future_frame(spark, "1999-06-01", "1999-06-07", n_branches=10)
    tf = F.datediff(F.col("ds"), F.lit("1995-01-01").cast("date")).cast("double")
    yhat = F.col("icept") + F.col("slope") * tf
    return (
        future.join(F.broadcast(fits), on="branch")
        .select(
            "branch",
            "ds",
            r4(yhat).alias("yhat"),
            round_count(F.greatest(yhat, F.lit(0.0))).alias("count"),
            "n_obs",
        )
    )


@register(
    "ml_train_fourier",
    tags=("ml", "applyinpandas"),
    oracle=f"""
    WITH {_fourier_model_ctes()}
    SELECT branch,
           FLOOR(c1 * 1e4 + 0.5) / 1e4 AS c_intercept,
           FLOOR(c2 / 1e3 * 1e6 + 0.5) / 1e6 AS c_trend,
           CAST({n_features()} AS INT) AS n_coeffs,
           FLOOR(sigma * 1e4 + 0.5) / 1e4 AS sigma,
           n_obs
    FROM fmodels
    """,
)
def ml_train_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: parallel per-branch OLS fit of the trend+Fourier surrogate
    (plans.training.train_models_q). Registry output: one row per branch
    with the coefficient summary — the DataFrame analog of 110 pickle
    files (c_trend reported per day: scaled coeff / T_SCALE).

    HASH-CHECKED (was rows-only through r4): the quantized fixed-point
    design makes the normal-equation moments exact integers and the
    unpivoted Gauss-Jordan solve a fixed IEEE op sequence, so the DuckDB
    oracle — the same 12 elimination steps unrolled as CTEs — reproduces
    every coefficient bit-for-bit (VERDICT r4 item #2)."""
    tune(spark)
    models = train_models_q(_daily_series(spark, sf_dir), cutoff=CUTOFF)
    return models.select(
        "branch",
        r4(F.element_at("coeffs", 1)).alias("c_intercept"),
        r6(F.element_at("coeffs", 2) / F.lit(1e3)).alias("c_trend"),
        F.size("coeffs").alias("n_coeffs"),
        r4(F.col("sigma")).alias("sigma"),
        "n_obs",
    )


_JUNE_FUT_SQL = f"""
      SELECT b.branch, CAST(d.d AS DATE) AS ds,
             CAST(date_diff('day', DATE '{EPOCH}', CAST(d.d AS DATE))
                  AS DOUBLE) AS t
      FROM (SELECT unnest(range(1, 11)) AS branch) b,
           (SELECT unnest(generate_series(DATE '1999-06-01',
                                          DATE '1999-06-07',
                                          INTERVAL 1 DAY)) AS d) d"""


def _score_ctes(fut_sql: str) -> str:
    """Scoring CTEs over a (branch, ds, t) future frame — the SQL twin of
    plans.training.score (same fold order, same rounding, same Count
    post-processing). Emits ``fscored(branch, ds, yhat, yhat_upper,
    count)``; expects ``fmodels`` in scope."""
    return f"""
    ffut AS ({fut_sql}
    ),
    fraw AS (
      SELECT f.branch, f.ds,
             ({_fourier_dot_sql("m")}) AS yhat_raw,
             m.sigma
      FROM ffut f JOIN fmodels m ON m.branch = f.branch
    ),
    fscored AS (
      SELECT branch, ds,
             FLOOR(yhat_raw * 1e4 + 0.5) / 1e4 AS yhat,
             FLOOR((yhat_raw + {Z80!r} * sigma) * 1e4 + 0.5) / 1e4
               AS yhat_upper,
             CAST(FLOOR(GREATEST(yhat_raw + {Z80!r} * sigma, 0e0) + 0.5)
                  AS BIGINT) AS "count"
      FROM fraw
    )"""


@register(
    "ml_forecast_fourier",
    tags=("ml", "applyinpandas"),
    oracle=f"""
    WITH {_fourier_model_ctes()},
    {_score_ctes(_JUNE_FUT_SQL)}
    SELECT branch, ds, yhat, yhat_upper, "count" FROM fscored
    """,
)
def ml_forecast_fourier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/M3: score the surrogate registry over a 7-day future frame with
    pure column arithmetic (zip_with dot product; plans.training.score) —
    yhat, the 80% upper bound, and the reference's Count post-processing.
    HASH-CHECKED (was rows-only through r4): coefficients come from the
    cross-engine-deterministic quantized fit; the oracle scores them with
    the identical left-associated dot product, so only libm sin/cos ulps
    separate the engines pre-rounding — absorbed by the 1e-4 grid."""
    tune(spark)
    models = train_models_q(_daily_series(spark, sf_dir), cutoff=CUTOFF)
    frame = _future_frame(spark, "1999-06-01", "1999-06-07", n_branches=10)
    return score(models, frame)


@register("ml_mllib_global_forecast", tags=("ml", "mllib"), oracle=None)
def ml_mllib_global_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MLlib tier (plans.mllib_forecast): branch one-hot x trend/DOW/
    Fourier features through OneHotEncoder + VectorAssembler +
    LinearRegression(solver='normal') - ONE distributed fit for all
    branches, closed-form solve (deterministic).

    PERMANENTLY rows-only — the ONLY rows-only registry entry, final per
    VERDICT r8 item #5 resolution (b), decided round 9 (see COVERAGE.md's
    r9 FINAL row): the point of this query is to exercise MLlib's
    own WLS solver and vector pipeline, whose internal regularization/
    pivoting choices are not reproducible as an ANSI-SQL op sequence;
    re-deriving the coefficients with our quantized Gauss-Jordan would
    just re-test ml_train_fourier under another name — and the branch
    one-hot spans every l_suppkey (~1000 categories at sf0.1), so the
    normal-equation system is ~1012-dimensional: not expressible as a
    hand-unrolled ANSI-SQL solve at driver scale (VERDICT r7 item 7,
    option (a) evaluated and declined; restricting the fit to a few
    branches would test a different model). Resolution (b) instead:
    structurally excluded from the driver-sampled surface —
    suggest_next_front() skips rows-only entries, `_DRIVER_FRONT` is
    always 50 oracle-bearing names, and
    tests/test_oracle.py::test_driver_sampled_surface_is_fully_oracle_bearing
    pins that the first 50 queries() slots all carry oracles. pytest
    pins shape + determinism + forecast sanity for this entry."""
    tune(spark)
    from ..operators.materialize import materialize
    from ..plans.mllib_forecast import fit_global_model, score_global_model

    # materialize the training input ONCE (r14): the MLlib Pipeline fit is
    # several driver-sequenced actions (OneHotEncoder category scan, the
    # WLS normal-equation aggregate, summary passes) and each one lazily
    # re-ran the lineitem scan + daily groupBy — the r14 stage profile
    # showed the 3-task aggregation stage four times per call (~0.3 s
    # each). One checkpoint feeds the isEmpty probe and every fit pass;
    # partitioning is preserved, so the WLS partials and their merge tree
    # are unchanged (fit stays deterministic, pinned by test_ml).
    daily = materialize(
        _daily_series(spark, sf_dir).filter(
            F.col("ds") <= F.lit(CUTOFF).cast("date")
        ),
        "mllib-daily",
    )
    if daily.isEmpty():
        # empty history: nothing to fit — empty scored frame with the
        # output schema instead of an MLlib fit error on zero rows
        # (r12 empty-input sweep; limit-1 probe, negligible vs the fit)
        return spark.createDataFrame(
            [], "branch bigint, ds date, yhat double, count bigint"
        )
    model = fit_global_model(daily)
    frame = _future_frame(spark, "1999-06-01", "1999-06-07", n_branches=10)
    return score_global_model(model, frame)


def _svc_request_oracle() -> str:
    from .pipeline import _MONTH_CTE, _PCT_CTES, null_aware_tail_sql

    return f"""
    WITH {_PCT_CTES},
    {_MONTH_CTE},
    {_fourier_model_ctes()},
    {_score_ctes(_JUNE_FUT_SQL)},
    frame AS (
      SELECT s.branch,
             'R'                  AS move_type,
             DATE '1999-06-03'    AS input_date,
             s.ds,
             CAST(s."count" AS DOUBLE)    AS branch_forecast,
             CAST(month(s.ds) AS INT)     AS month,
             CAST(day(s.ds) AS INT)       AS day,
             CAST(6 AS INT)               AS imonth,
             CAST(3 AS INT)               AS iday
      FROM fscored s WHERE s.branch = 7
    ),
    {null_aware_tail_sql()}
    SELECT branch, move_type, input_date, ds, branch_forecast, pct_used,
           predicted_moves, hist_avg, diff_pp, band, comment
    FROM tail
    """


@register(
    "svc_forecast_request", tags=("pipeline", "service"),
    oracle=_svc_request_oracle(),
)
def svc_forecast_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full /forecast/ endpoint (plans.service.forecast_request): window
    clamp -> registry check -> model scoring -> percentage fallback chain ->
    banded daily rows. HASH-CHECKED end-to-end (was rows-only through r4):
    the oracle chains the quantized Fourier-fit CTEs, the scoring twin, and
    the full percentage/tail SQL — the entire request path, model included,
    value-compared against DuckDB (VERDICT r4 item #2)."""
    import datetime as dt

    tune(spark)
    from ..plans.percentages import compute_percentages
    from ..plans.service import forecast_request

    li = load_table(spark, sf_dir, "lineitem")
    pct = compute_percentages(
        li, branch_col="l_suppkey", type_col="l_returnflag",
        date_col="l_shipdate", count_col="l_quantity",
    )
    # Train only the requested branch: the request consumes exactly one
    # model, per-branch fits are independent (groupBy-applyInPandas), and
    # the registry probe inside forecast_request only inspects branch 7 —
    # so pruning the training input is dead-code elimination the optimizer
    # cannot see through the opaque Python stage (guide §1.2 "don't
    # compute things you throw away"; §4.1 column/row pruning around
    # opaque functions). The branch filter reaches the parquet scan as a
    # PushedFilter. Output is bit-identical (oracle-checked); the
    # all-branch registry remains ml_train_fourier's surface.
    models = train_models_q(
        _daily_series(spark, sf_dir).filter(F.col("branch") == 7),
        cutoff=CUTOFF,
    )
    daily, _ = forecast_request(
        spark, models, pct, date="1999-06-03", branch=7, move_type="R",
        today=dt.date(1999, 6, 1), max_date=dt.date(1999, 7, 31),
    )
    return daily


@register(
    "svc_trends_request",
    tags=("pipeline", "service"),
    oracle="""
    WITH t AS (
      SELECT CAST(year(l_shipdate) AS INT)  AS year,
             CAST(l_shipdate AS DATE)       AS ds,
             strftime(l_shipdate, '%m-%d')  AS month_day,
             FLOOR(SUM(l_quantity) * 1e2 + 0.5) / 1e2 AS total_moves
      FROM lineitem
      WHERE l_suppkey = 7
        AND year(l_shipdate) BETWEEN 1995 AND 2000
        AND month(l_shipdate) * 100 + day(l_shipdate) BETWEEN 601 AND 607
      GROUP BY 1, 2, 3
    )
    SELECT year,
           array_to_string(
             list(month_day || ':' || CAST(total_moves AS VARCHAR) ORDER BY ds),
             ',') AS days
    FROM t
    GROUP BY year
    ORDER BY year
    """,
)
def svc_trends_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full /historical_trends/ endpoint (plans.service.trends_request):
    clamp -> one-pass per-year aggregate -> nested per-year rows. Oracle:
    the request's clamp resolves to the 1999-06-01..06-07 window
    (input 06-03 with today 06-01), so the endpoint output equals the
    nested trends SQL over month-day 601-607 for branch 7."""
    import datetime as dt

    tune(spark)
    from ..plans.service import trends_request

    li = load_table(spark, sf_dir, "lineitem")
    return trends_request(
        spark, li, branch_col="l_suppkey", date_col="l_shipdate",
        count_col="l_quantity", date="1999-06-03", branch=7, move_type=None,
        type_col="l_returnflag", today=dt.date(1999, 6, 1),
        max_date=dt.date(1999, 7, 31), years=(1995, 2000),
    )


def _svc_batch_oracle() -> str:
    from .pipeline import _MONTH_CTE, _PCT_CTES, null_aware_tail_sql

    # Window clamps resolved per forecast_window: 1999-06-03 -> 06-01..06-07
    # (today-clamp snap forward), 1999-07-30 -> 07-25..07-31 (max-date-clamp
    # snap backward). These literals are pinned to the clamp helper by
    # tests/test_window_clamp.py::test_svc_batch_oracle_window_literals —
    # if forecast_window's clamp logic ever changes, that test fails before
    # this oracle can silently desynchronize from the Spark path.
    batch_fut = f"""
      SELECT DISTINCT s.branch, s.ds,
             CAST(date_diff('day', DATE '{EPOCH}', s.ds) AS DOUBLE) AS t
      FROM bspine s"""
    return f"""
    WITH {_PCT_CTES},
    {_MONTH_CTE},
    {_fourier_model_ctes()},
    breqs AS (
      SELECT b.branch,
             CASE WHEN b.branch % 2 = 0 THEN 'R' ELSE NULL END AS move_type,
             d.input_date, d.ws
      FROM (SELECT unnest(range(1, 11)) AS branch) b
      CROSS JOIN (VALUES (DATE '1999-06-03', DATE '1999-06-01'),
                         (DATE '1999-07-30', DATE '1999-07-25'))
                 d(input_date, ws)
    ),
    bspine AS (
      SELECT r.branch, r.move_type, r.input_date,
             CAST(unnest(generate_series(r.ws, r.ws + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS ds
      FROM breqs r
    ),
    {_score_ctes(batch_fut)},
    frame AS (
      SELECT sp.branch, sp.move_type, sp.input_date, sp.ds,
             CAST(s."count" AS DOUBLE)          AS branch_forecast,
             CAST(month(sp.ds) AS INT)          AS month,
             CAST(day(sp.ds) AS INT)            AS day,
             CAST(month(sp.input_date) AS INT)  AS imonth,
             CAST(day(sp.input_date) AS INT)    AS iday
      FROM bspine sp
      JOIN fscored s ON s.branch = sp.branch AND s.ds = sp.ds
    ),
    {null_aware_tail_sql()}
    SELECT branch, move_type, input_date, ds, branch_forecast, pct_used,
           predicted_moves, hist_avg, diff_pp, band, comment
    FROM tail
    """


@register(
    "svc_forecast_batch", tags=("pipeline", "service", "batch"),
    oracle=_svc_batch_oracle(),
)
def svc_forecast_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A BATCH of 20 forecast requests (10 branches x 2 dates, mixed
    move_types) planned as one Spark job (plans.service.forecast_batch):
    per-row window clamps, exploded spines, one scoring pass, one tail.
    The reference would serve these as 20 HTTP calls x ~30 round-trips.
    HASH-CHECKED (was rows-only through r4): the oracle re-derives both
    clamped windows, the quantized model fit, the scoring twin, and the
    NULL-move_type-aware tail (odd branches take the silent-demotion 100%
    path) — all 140 rows value-compared."""
    import datetime as dt

    tune(spark)
    from ..plans.percentages import compute_percentages
    from ..plans.service import forecast_batch

    li = load_table(spark, sf_dir, "lineitem")
    pct = compute_percentages(
        li, branch_col="l_suppkey", type_col="l_returnflag",
        date_col="l_shipdate", count_col="l_quantity",
    )
    # Train only the batch's 10 requested branches (same pruning rationale
    # as svc_forecast_request: per-branch fits are independent and the
    # batch's registry probes only inspect branches 1-10).
    models = train_models_q(
        _daily_series(spark, sf_dir).filter(F.col("branch") <= 10),
        cutoff=CUTOFF,
    )
    reqs = spark.createDataFrame(
        [
            (b, "R" if b % 2 == 0 else None, d)
            for b in range(1, 11)
            for d in (dt.date(1999, 6, 3), dt.date(1999, 7, 30))
        ],
        "branch long, move_type string, input_date date",
    )
    return forecast_batch(
        spark, models, pct, reqs,
        today=dt.date(1999, 6, 1), max_date=dt.date(1999, 7, 31),
    )


@register(
    "ml_naive_bayes_langid",
    tags=("ml", "text", "classifier"),
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    train AS (SELECT * FROM tok WHERE doc_id % 10 < 8),
    test  AS (SELECT * FROM tok WHERE doc_id % 10 >= 8),
    ct AS (SELECT lang, tok, COUNT(*) AS c FROM train GROUP BY 1, 2),
    nl AS (SELECT lang, SUM(c) AS n_l FROM ct GROUP BY 1),
    v  AS (SELECT COUNT(DISTINCT tok) AS v FROM train),
    pr AS (
      SELECT lang,
             ln(CAST(COUNT(DISTINCT doc_id) AS DOUBLE) / MIN(t.n)) AS prior_ln
      FROM train, (SELECT COUNT(DISTINCT doc_id) AS n FROM train) t
      GROUP BY lang
    ),
    tf AS (
      SELECT doc_id, lang AS actual_lang, tok, COUNT(*) AS tf
      FROM test GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT tf.doc_id, tf.actual_lang, nl.lang,
             MIN(pr.prior_ln)
               + SUM(tf.tf * ln((COALESCE(ct.c, 0) + 1.0) / (nl.n_l + v.v)))
               AS score
      FROM tf
      CROSS JOIN v
      CROSS JOIN nl
      JOIN pr ON pr.lang = nl.lang
      LEFT JOIN ct ON ct.lang = nl.lang AND ct.tok = tf.tok
      GROUP BY tf.doc_id, tf.actual_lang, nl.lang
    )
    SELECT doc_id, actual_lang, lang AS predicted_lang,
           CAST(actual_lang = lang AS INT) AS is_correct
    FROM scored
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY doc_id
      ORDER BY FLOOR(score * 1e6 + 0.5) DESC, lang
    ) = 1
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language identification, trained and scored
    entirely in SQL aggregates: 80/20 split by doc_id, Laplace-smoothed
    class-conditional token log-probs, argmax posterior per held-out doc
    (rounded score + lang tie-break for cross-engine determinism). The
    supervised counterpart of the heuristic text_langid — the standard
    fastText-era baseline a corpus pipeline runs at ingest. Scale: the
    model is a (lang × vocab) count frame — model-sized, broadcast here,
    a shuffle join on tok at web scale; the corpus-scale work is two
    token aggregations, both map-side combinable. No Python in the plan."""
    from pyspark.sql.window import Window

    from ..functions.text import tokens

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    train = tok.filter(F.col("doc_id") % 10 < 8)
    test = tok.filter(F.col("doc_id") % 10 >= 8)

    ct = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    nl = ct.groupBy("lang").agg(F.sum("c").alias("n_l"))
    v = train.agg(F.countDistinct("tok").alias("v"))
    n_docs = train.agg(F.countDistinct("doc_id").alias("n"))
    pr = (
        train.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("d"))
        .crossJoin(F.broadcast(n_docs))
        .select("lang", F.log(F.col("d").cast("double") / F.col("n")).alias("prior_ln"))
    )

    tf = test.groupBy(
        "doc_id", F.col("lang").alias("actual_lang"), "tok"
    ).agg(F.count(F.lit(1)).alias("tf"))

    classes = nl.join(pr, "lang").crossJoin(F.broadcast(v))
    scored = (
        tf.crossJoin(F.broadcast(classes))
        .join(F.broadcast(ct), ["lang", "tok"], "left")
        .groupBy("doc_id", "actual_lang", "lang")
        .agg(
            (
                F.min("prior_ln")
                + F.sum(
                    F.col("tf")
                    * F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                        / (F.col("n_l") + F.col("v"))
                    )
                )
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.floor(F.col("score") * 1e6 + F.lit(0.5)).desc(), F.col("lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "actual_lang",
            F.col("lang").alias("predicted_lang"),
            (F.col("actual_lang") == F.col("lang")).cast("int").alias("is_correct"),
        )
    )


@register(
    "ml_seasonal_naive_forecast",
    tags=("ml", "timeseries", "forecast"),
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    e AS (SELECT MAX(day) AS endd FROM daily),
    dowm AS (
      SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,  -- align to Spark's 1=Sun..7=Sat
             AVG(CAST(n AS DOUBLE)) AS m
      FROM daily GROUP BY 1
    ),
    future AS (
      SELECT endd + CAST(i AS INT) AS day,
             CAST(dayofweek(endd + CAST(i AS INT)) + 1 AS INT) AS dow
      FROM e, LATERAL (SELECT unnest(generate_series(1, 7)) AS i) t
    )
    SELECT f.day, f.dow,
           FLOOR(d.m * 1e4 + 0.5) / 1e4 AS forecast
    FROM future f JOIN dowm d USING (dow)
    """,
)
def ml_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast of the next 7 days of event volume: each
    future day predicts the historical mean of its weekday — the
    canonical baseline any Prophet-class model (the reference's entire
    product, pretrain_models.py:22-29) must beat before its complexity
    is justified, and the natural yardstick next to ml_linreg_forecast /
    ml_forecast_fourier. One shuffle to the daily frame; the weekday
    means (7 rows) broadcast onto a generated future axis."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    endd = daily.agg(F.max("day").alias("endd"))
    dowm = daily.groupBy(F.dayofweek("day").cast("int").alias("dow")).agg(
        F.avg(F.col("n").cast("double")).alias("m")
    )
    future = endd.select(
        F.explode(
            F.sequence(
                F.date_add(F.col("endd"), 1), F.date_add(F.col("endd"), 7)
            )
        ).alias("day")
    ).select("day", F.dayofweek("day").cast("int").alias("dow"))
    return future.join(F.broadcast(dowm), "dow").select(
        "day",
        "dow",
        (F.floor(F.col("m") * 1e4 + F.lit(0.5)) / 1e4).alias("forecast"),
    )


@register(
    "ml_ar1_forecast",
    tags=("ml", "timeseries", "forecast"),
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT day, y, LAG(y) OVER (ORDER BY day) AS yprev FROM daily
    ),
    fit AS (
      SELECT regr_slope(y, yprev) AS phi,
             AVG(y) AS mu_y
      FROM lagged WHERE yprev IS NOT NULL
    ),
    last AS (
      SELECT y AS y_last, day AS last_day FROM daily
      ORDER BY day DESC LIMIT 1
    ),
    horizon AS (SELECT unnest(generate_series(1, 7)) AS h)
    SELECT CAST(last.last_day + CAST(h.h AS INT) AS DATE) AS day,
           CAST(h.h AS INT) AS h,
           FLOOR(fit.phi * 1e6 + 0.5) / 1e6 AS phi,
           FLOOR((fit.mu_y + pow(fit.phi, h.h) * (last.y_last - fit.mu_y))
                 * 1e4 + 0.5) / 1e4 AS forecast
    FROM horizon h CROSS JOIN fit CROSS JOIN last
    """,
)
def ml_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) mean-reverting forecast of daily event volume — the entry
    point of the ARIMA family, fitted in closed form (φ = the OLS slope
    of yₜ on yₜ₋₁ via the built-in regr_slope aggregate; unconditional
    mean μ from the same pass) and forecast h steps ahead with the exact
    recursion-free identity ŷ(T+h) = μ + φʰ(y_T − μ). Complements the
    trend (ml_linreg), seasonal (ml_seasonal_naive, Fourier), and
    smoothing (ts_ewma) families with the autoregressive one. Scale:
    one shuffle to the daily frame; the fit is a 1-row aggregate
    broadcast onto a generated horizon."""
    from pyspark.sql.window import Window

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    lagged = daily.select(
        "day", "y", F.lag("y").over(Window.orderBy("day")).alias("yprev")
    )
    fit = lagged.filter(F.col("yprev").isNotNull()).agg(
        F.regr_slope(F.col("y"), F.col("yprev")).alias("phi"),
        F.avg("y").alias("mu_y"),
    )
    last = daily.orderBy(F.col("day").desc()).limit(1).select(
        F.col("y").alias("y_last"), F.col("day").alias("last_day")
    )
    horizon = daily.sparkSession.range(1, 8).select(
        F.col("id").cast("int").alias("h")
    )
    return (
        horizon.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(last))
        .select(
            F.date_add(F.col("last_day"), F.col("h")).alias("day"),
            "h",
            (F.floor(F.col("phi") * 1e6 + F.lit(0.5)) / 1e6).alias("phi"),
            (
                F.floor(
                    (
                        F.col("mu_y")
                        + F.pow(F.col("phi"), F.col("h"))
                        * (F.col("y_last") - F.col("mu_y"))
                    )
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("forecast"),
        )
    )


@register(
    "ml_forecast_backtest",
    tags=("ml", "timeseries", "forecast", "evaluation"),
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    cutoff AS (SELECT MAX(day) - 7 AS cut FROM daily),
    train AS (SELECT d.* FROM daily d CROSS JOIN cutoff WHERE day <= cut),
    test  AS (SELECT d.* FROM daily d CROSS JOIN cutoff WHERE day > cut),
    snaive AS (
      SELECT CAST(dayofweek(day) + 1 AS INT) AS dow, AVG(y) AS f
      FROM train GROUP BY 1
    ),
    ar1 AS (
      SELECT regr_slope(y, yprev) AS phi, AVG(y) AS mu
      FROM (SELECT y, LAG(y) OVER (ORDER BY day) AS yprev FROM train)
      WHERE yprev IS NOT NULL
    ),
    last AS (SELECT y AS y_last, day AS last_day FROM train
             ORDER BY day DESC LIMIT 1),
    scored AS (
      SELECT t.day, t.y,
             s.f AS f_snaive,
             ar1.mu + pow(ar1.phi, date_diff('day', last.last_day, t.day))
               * (last.y_last - ar1.mu) AS f_ar1
      FROM test t
      JOIN snaive s ON s.dow = CAST(dayofweek(t.day) + 1 AS INT)
      CROSS JOIN ar1 CROSS JOIN last
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS horizon_days,
           FLOOR(AVG(ABS(y - f_snaive)) * 1e4 + 0.5) / 1e4 AS mae_snaive,
           FLOOR(AVG(ABS(y - f_ar1)) * 1e4 + 0.5) / 1e4 AS mae_ar1,
           AVG(ABS(y - f_snaive)) < AVG(ABS(y - f_ar1)) AS snaive_wins
    FROM scored
    """,
)
def ml_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin BACKTEST of the forecast family: hold out the last
    7 days, fit seasonal-naive and AR(1) on the rest, score both on the
    holdout (MAE), declare the winner — the evaluation loop the
    reference never runs on its Prophet models (it ships fits blind;
    reference pretrain_models.py trains and saves, nothing measures).
    Model selection becomes a query: the same pattern at 100 TB
    backtests per segment with one extra GROUP BY. All closed-form —
    one shuffle to the daily frame, 1-row model frames broadcast."""
    from pyspark.sql.window import Window

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    cutoff = daily.agg(F.date_sub(F.max("day"), 7).alias("cut"))
    dc = daily.crossJoin(F.broadcast(cutoff))
    train = dc.filter(F.col("day") <= F.col("cut")).select("day", "y")
    test = dc.filter(F.col("day") > F.col("cut")).select("day", "y")
    snaive = train.groupBy(
        (F.dayofweek("day") + 0).cast("int").alias("dow")
    ).agg(F.avg("y").alias("f"))
    lagged = train.select(
        "y", F.lag("y").over(Window.orderBy("day")).alias("yprev")
    )
    ar1 = lagged.filter(F.col("yprev").isNotNull()).agg(
        F.regr_slope(F.col("y"), F.col("yprev")).alias("phi"),
        F.avg("y").alias("mu"),
    )
    last = train.orderBy(F.col("day").desc()).limit(1).select(
        F.col("y").alias("y_last"), F.col("day").alias("last_day")
    )
    scored = (
        test.join(
            F.broadcast(snaive),
            snaive["dow"] == F.dayofweek(test["day"]).cast("int"),
        )
        .crossJoin(F.broadcast(ar1))
        .crossJoin(F.broadcast(last))
        .select(
            "day",
            "y",
            F.col("f").alias("f_snaive"),
            (
                F.col("mu")
                + F.pow(F.col("phi"), F.datediff(F.col("day"), F.col("last_day")))
                * (F.col("y_last") - F.col("mu"))
            ).alias("f_ar1"),
        )
    )
    r4_ = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("horizon_days"),
        r4_(F.avg(F.abs(F.col("y") - F.col("f_snaive")))).alias("mae_snaive"),
        r4_(F.avg(F.abs(F.col("y") - F.col("f_ar1")))).alias("mae_ar1"),
        (
            F.avg(F.abs(F.col("y") - F.col("f_snaive")))
            < F.avg(F.abs(F.col("y") - F.col("f_ar1")))
        ).alias("snaive_wins"),
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend exponential smoothing (per-series recursive state)
# ---------------------------------------------------------------------------
_HOLT_ALPHA = 0.5  # level gain  — exact binary fraction on purpose
_HOLT_BETA = 0.25  # trend gain  — exact binary fraction on purpose
_HOLT_H = 7


@register(
    "ml_holt_winters",
    tags=("ml", "timeseries", "forecast", "iterative"),
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    maxrn AS (SELECT event_type, MAX(rn) AS t FROM idx GROUP BY 1),
    state AS (
      SELECT event_type, rn, y AS l, CAST(0 AS DOUBLE) AS b
      FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.event_type, i.rn,
             FLOOR(({_HOLT_ALPHA} * i.y + {1 - _HOLT_ALPHA} * (s.l + s.b))
                   * 1e6 + 0.5) / 1e6 AS l,
             FLOOR(({_HOLT_BETA}
                    * (FLOOR(({_HOLT_ALPHA} * i.y
                              + {1 - _HOLT_ALPHA} * (s.l + s.b))
                             * 1e6 + 0.5) / 1e6 - s.l)
                    + {1 - _HOLT_BETA} * s.b) * 1e6 + 0.5) / 1e6 AS b
      FROM state s JOIN idx i
        ON i.event_type = s.event_type AND i.rn = s.rn + 1
    ),
    fin AS (
      SELECT s.event_type, s.l, s.b
      FROM state s JOIN maxrn m
        ON m.event_type = s.event_type AND s.rn = m.t
    ),
    last AS (SELECT event_type, MAX(day) AS last_day FROM daily GROUP BY 1),
    horizon AS (SELECT unnest(generate_series(1, {_HOLT_H})) AS h)
    SELECT f.event_type,
           CAST(h.h AS INT) AS h,
           l.last_day + CAST(h.h AS INT) AS day,
           f.l AS level,
           f.b AS trend,
           FLOOR((f.l + h.h * f.b) * 1e4 + 0.5) / 1e4 AS forecast
    FROM fin f
    JOIN last l USING (event_type)
    CROSS JOIN horizon h
    """,
)
def ml_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing, fitted PER
    SERIES (event_type) over the daily event-volume series and forecast
    _HOLT_H=7 days ahead — the smoothing-with-trend member of the
    forecast family (naive-seasonal / AR(1) / linreg / Fourier OLS are
    the others), i.e. the exponential-smoothing lineage the reference's
    Prophet sits on top of. The recursion l_t = a*y_t + (1-a)(l+b),
    b_t = c*(l_t - l) + (1-c)*b is inherently sequential WITHIN a
    series, so the engine shape is groupBy(series).applyInPandas — state
    lives inside one Arrow batch per series, and at 100 TB the
    parallelism axis is the millions of independent series, not the
    ~1000-point recursion inside each (the same "fit locally, apply
    distributed" doctrine as plans.training's per-branch OLS).
    Cross-engine exactness: gains are exact binary fractions (a=0.5,
    c=0.25), inputs are integer counts, and the state snaps to the 1e-6
    grid after every step with the same FLOOR(x*1e6+0.5) both sides, so
    the DuckDB RECURSIVE-CTE replica reproduces level/trend bit-for-bit
    with no unrolling limit."""
    import math

    import pandas as pd

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))

    def snap6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = [float(v) for v in pdf["y"]]
        l, b = ys[0], 0.0
        for y in ys[1:]:
            lt = snap6(_HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (l + b))
            b = snap6(_HOLT_BETA * (lt - l) + (1 - _HOLT_BETA) * b)
            l = lt
        last_day = pdf["day"].iloc[-1]
        et = pdf["event_type"].iloc[0]
        rows = [
            {
                "event_type": et,
                "h": h,
                "day": last_day + pd.Timedelta(days=h),
                "level": l,
                "trend": b,
                "forecast": math.floor((l + h * b) * 1e4 + 0.5) / 1e4,
            }
            for h in range(1, _HOLT_H + 1)
        ]
        return pd.DataFrame(rows)

    return daily.groupBy("event_type").applyInPandas(
        fit,
        schema="event_type string, h int, day date, "
        "level double, trend double, forecast double",
    )


# ---------------------------------------------------------------------------
# Holt-Winters ADDITIVE SEASONAL (triple exponential smoothing)
# ---------------------------------------------------------------------------
_HW_SEASON = 7  # weekly
_HW_GAMMA = 0.25  # seasonal gain — exact binary fraction


@register(
    "ml_holt_winters_seasonal",
    tags=("ml", "timeseries", "forecast", "iterative"),
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    maxrn AS (
      SELECT event_type, MAX(rn) AS t FROM idx
      GROUP BY 1 HAVING MAX(rn) >= 2 * {_HW_SEASON}
    ),
    l0 AS (
      SELECT event_type,
             FLOOR(SUM(y) / {_HW_SEASON} * 1e6 + 0.5) / 1e6 AS l0
      FROM idx WHERE rn <= {_HW_SEASON} GROUP BY 1
    ),
    s0 AS (
      SELECT i.event_type, l.l0,
             list_transform(list(i.y ORDER BY i.rn),
                            v -> FLOOR((v - l.l0) * 1e6 + 0.5) / 1e6) AS s
      FROM idx i JOIN l0 l USING (event_type)
      WHERE i.rn <= {_HW_SEASON}
      GROUP BY i.event_type, l.l0
    ),
    state AS (
      SELECT s0.event_type, {_HW_SEASON} AS rn,
             s0.l0 AS l, CAST(0 AS DOUBLE) AS b, s0.s
      FROM s0 JOIN maxrn m ON m.event_type = s0.event_type
      UNION ALL
      SELECT i.event_type, i.rn,
             FLOOR(({_HOLT_ALPHA} * (i.y - st.s[1])
                    + {1 - _HOLT_ALPHA} * (st.l + st.b)) * 1e6 + 0.5) / 1e6,
             FLOOR(({_HOLT_BETA}
                    * (FLOOR(({_HOLT_ALPHA} * (i.y - st.s[1])
                              + {1 - _HOLT_ALPHA} * (st.l + st.b))
                             * 1e6 + 0.5) / 1e6 - st.l)
                    + {1 - _HOLT_BETA} * st.b) * 1e6 + 0.5) / 1e6,
             list_append(st.s[2:{_HW_SEASON}],
               FLOOR(({_HW_GAMMA}
                      * (i.y - FLOOR(({_HOLT_ALPHA} * (i.y - st.s[1])
                                      + {1 - _HOLT_ALPHA} * (st.l + st.b))
                                     * 1e6 + 0.5) / 1e6)
                      + {1 - _HW_GAMMA} * st.s[1]) * 1e6 + 0.5) / 1e6)
      FROM state st JOIN idx i
        ON i.event_type = st.event_type AND i.rn = st.rn + 1
    ),
    fin AS (
      SELECT st.event_type, st.l, st.b, st.s
      FROM state st JOIN maxrn m
        ON m.event_type = st.event_type AND st.rn = m.t
    ),
    last AS (SELECT event_type, MAX(day) AS last_day FROM daily GROUP BY 1),
    horizon AS (SELECT unnest(generate_series(1, {_HOLT_H})) AS h)
    SELECT f.event_type,
           CAST(h.h AS INT) AS h,
           l.last_day + CAST(h.h AS INT) AS day,
           f.l AS level,
           f.b AS trend,
           f.s[h.h] AS seasonal,
           FLOOR((f.l + h.h * f.b + f.s[h.h]) * 1e4 + 0.5) / 1e4 AS forecast
    FROM fin f
    JOIN last l USING (event_type)
    CROSS JOIN horizon h
    """,
)
def ml_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE-SEASONAL triple exponential smoothing per
    series (event_type), weekly season m=7, forecast 7 days — the full
    classical member of the smoothing family (level + trend + seasonal
    state), i.e. the non-Bayesian ancestor of the reference's Prophet
    (trend + seasonality decomposition, pretrain_models.py:22-29).
    Initialization: level = mean of the first week, trend = 0, seasonal
    = first-week deviations; recursion l_t = a*(y_t - s_{{t-m}}) +
    (1-a)(l+b); b_t as Holt; s_t = g*(y_t - l_t) + (1-g)*s_{{t-m}},
    gains all exact binary fractions, every state snapped to the 1e-6
    grid — so the DuckDB RECURSIVE CTE (seasonal ring carried as a
    rotating LIST column) reproduces level/trend/seasonals bit-for-bit.
    Series shorter than two full seasons are excluded (both engines).
    Engine shape and 100 TB posture identical to ml_holt_winters:
    groupBy(series).applyInPandas, parallelism = number of series,
    forecast day T+h reuses the season of observed day T+h-m."""
    import math

    import pandas as pd

    tune(spark)
    m = _HW_SEASON
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))

    def snap6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = [float(v) for v in pdf["y"]]
        if len(ys) < 2 * m:
            return pd.DataFrame(
                columns=[
                    "event_type", "h", "day", "level", "trend",
                    "seasonal", "forecast",
                ]
            )
        l = snap6(sum(ys[:m]) / m)
        b = 0.0
        s = [snap6(y - l) for y in ys[:m]]
        for y in ys[m:]:
            s_old = s[0]
            lt = snap6(_HOLT_ALPHA * (y - s_old) + (1 - _HOLT_ALPHA) * (l + b))
            b = snap6(_HOLT_BETA * (lt - l) + (1 - _HOLT_BETA) * b)
            st = snap6(_HW_GAMMA * (y - lt) + (1 - _HW_GAMMA) * s_old)
            s = s[1:] + [st]
            l = lt
        last_day = pdf["day"].iloc[-1]
        et = pdf["event_type"].iloc[0]
        rows = [
            {
                "event_type": et,
                "h": h,
                "day": last_day + pd.Timedelta(days=h),
                "level": l,
                "trend": b,
                "seasonal": s[h - 1],
                "forecast": math.floor((l + h * b + s[h - 1]) * 1e4 + 0.5)
                / 1e4,
            }
            for h in range(1, _HOLT_H + 1)
        ]
        return pd.DataFrame(rows)

    return daily.groupBy("event_type").applyInPandas(
        fit,
        schema="event_type string, h int, day date, level double, "
        "trend double, seasonal double, forecast double",
    )


# --- isotonic regression: per-series PAVA with a minimax oracle -------------

# Series are fenced to their most recent _ISO_MAX_DAYS days: the oracle's
# closed-form replica is O(n^3) in series length (fine for the per-key
# screening series this targets; PAVA itself is O(n)). Inactive at fixture
# SFs (~30-day series); mirrored EXACTLY in the oracle.
_ISO_MAX_DAYS = 120


def _isotonic_oracle() -> str:
    """Closed-form minimax replica of PAVA: for the L2 nondecreasing fit,
    fitted[i] = max_{j<=i} min_{k>=i} mean(y[j..k]) (Robertson/Wright/
    Dykstra 1988, eq. 1.9-1.13). Every candidate mean is the SAME
    integer-sum / integer-count division the PAVA pool computes, so the
    selected double is bit-identical; distinct rational means on integer
    daily counts differ by >= 1/n^2 — far above double noise — so the
    max/min comparisons are exact too."""
    return f"""
    WITH daily0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    fenced AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY day DESC) AS rdesc
        FROM daily0
      ) WHERE rdesc <= {_ISO_MAX_DAYS}
    ),
    daily AS (
      SELECT event_type, day, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS i,
             CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS s
      FROM fenced
    ),
    avgs AS (
      SELECT j.event_type, j.i AS j, k.i AS k,
             CAST(k.s - j.s + j.y AS DOUBLE) / (k.i - j.i + 1) AS mu
      FROM daily j JOIN daily k
        ON k.event_type = j.event_type AND k.i >= j.i
    ),
    inner_min AS (
      SELECT a.event_type, a.j, g.i, MIN(a.mu) AS mn
      FROM avgs a JOIN daily g
        ON g.event_type = a.event_type AND g.i BETWEEN a.j AND a.k
      GROUP BY 1, 2, 3
    ),
    fit AS (
      SELECT event_type, i, MAX(mn) AS f
      FROM inner_min GROUP BY 1, 2
    )
    SELECT d.event_type, d.day, d.y,
           FLOOR(f.f * 1e6 + 0.5) / 1e6 AS fitted
    FROM daily d JOIN fit f ON f.event_type = d.event_type AND f.i = d.i
    """


@register(
    "ml_isotonic_trend",
    tags=("ml", "timeseries", "analytics"),
    oracle=_isotonic_oracle(),
)
def ml_isotonic_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone nondecreasing L2) regression of each
    event_type's daily-count series via the Pool-Adjacent-Violators
    Algorithm — the shape-constrained trend fit (and the standard
    probability-calibration primitive) the smoothing family lacks:
    unlike EWMA/Holt it imposes ORDER, not recency decay. Pools carry
    EXACT integer (sum, count) state — violator merges compare pools by
    integer cross-multiplication, division happens once per final pool —
    so the emitted doubles are the same integer-ratio divisions the
    oracle's closed-form minimax formula (fitted[i] = max_{{j<=i}}
    min_{{k>=i}} mean(y[j..k])) selects: bit-identical before the
    rounding grid. Engine shape: groupBy(event_type).applyInPandas, the
    canonical per-series sequential-algorithm tier (same topology as
    holt_winters); parallelism = number of series; O(n) per series with
    the `_ISO_MAX_DAYS` fence (mirrored in the oracle) bounding the
    oracle's O(n^3) replica."""
    import pandas as pd

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values("day").tail(_ISO_MAX_DAYS).reset_index(drop=True)
        ys = [int(v) for v in pdf["y"]]
        # PAVA with exact integer pool state: (sum, count) per pool;
        # merge while the new pool's mean undercuts its predecessor's
        # (integer cross-multiplication — no division until emission).
        pools: list[list[int]] = []  # [sum, count]
        for y in ys:
            pools.append([y, 1])
            while len(pools) > 1 and (
                pools[-1][0] * pools[-2][1] < pools[-2][0] * pools[-1][1]
            ):
                s2, c2 = pools.pop()
                pools[-1][0] += s2
                pools[-1][1] += c2
        fitted: list[float] = []
        for s, c in pools:
            mu = s / c
            fitted.extend([math.floor(mu * 1e6 + 0.5) / 1e6] * c)
        out = pdf[["event_type", "day", "y"]].copy()
        out["fitted"] = fitted
        return out

    return daily.groupBy("event_type").applyInPandas(
        fit, schema="event_type string, day date, y long, fitted double"
    )


# --- intermittent-demand forecasting: Croston's method ----------------------

_CR_ALPHA = 0.25  # dyadic smoothing gain (exact in binary floating point)


@register(
    "ml_croston_intermittent",
    tags=("ml", "timeseries", "forecast"),
    oracle="""
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    idx AS (
      SELECT user_id, y,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS j,
             COUNT(*) OVER (PARTITION BY user_id) AS m,
             date_diff('day',
                       LAG(day) OVER (PARTITION BY user_id ORDER BY day),
                       day) AS gap
      FROM d
    ),
    s AS (
      SELECT user_id, CAST(MIN(m) AS BIGINT) AS n_demands,
             SUM(CASE WHEN j = 1 THEN power(0.75e0, m - 1) * y
                      ELSE 0.25e0 * power(0.75e0, m - j) * y END) AS z,
             SUM(CASE WHEN j = 2 THEN power(0.75e0, m - 2) * gap
                      WHEN j > 2 THEN 0.25e0 * power(0.75e0, m - j) * gap
                      ELSE 0e0 END) AS p
      FROM idx GROUP BY user_id HAVING MIN(m) >= 2
    )
    SELECT user_id, n_demands,
           FLOOR(z * 1e6 + 0.5) / 1e6 AS demand_size,
           FLOOR(p * 1e6 + 0.5) / 1e6 AS demand_interval,
           FLOOR(z / p * 1e6 + 0.5) / 1e6 AS forecast_rate
    FROM s
    """,
)
def ml_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (Croston 1972) for INTERMITTENT demand — the
    forecaster the smoothing family (Holt, Holt-Winters, seasonal naive,
    AR(1)) lacks: when a series is mostly zeros (spare parts, per-user
    purchases), smooth the nonzero demand SIZES and the inter-demand
    INTERVALS separately and forecast their ratio z/p. Series = per-user
    daily purchase counts (median ~11 demand days — genuinely sparse).
    Exactness: because exponential smoothing over only the m demand
    events telescopes to z_m = (1-a)^(m-1) y_1 + a Σ (1-a)^(m-j) y_j
    (init z=y_1; intervals analogously with init p=gap_2), BOTH engines
    compute identical per-term doubles (a=0.25 dyadic, power of an
    exact base) and only the engine-ordered SUM carries ulp noise —
    absorbed by the r6 grid, the same contract as the attribution and
    fit-sigma oracles. Engine shape: one groupBy((user, day)) builds
    demand events, one groupBy(user) folds the closed form IN-ROW over
    the sorted (day, y) array — no window pass, no join, no recursion;
    per-series state is the demand-event array (sparse by definition).
    At 100 TB parallelism is per-series, the intermittent-series shape
    (most days contribute no row at all)."""
    tune(spark)
    a, b = _CR_ALPHA, 1.0 - _CR_ALPHA
    ev = load_table(spark, sf_dir, "events")
    d = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    g = d.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("arr")
    ).filter(F.size("arr") >= 2)
    zexpr = (
        "aggregate(transform(sequence(1, size(arr)), j -> CASE WHEN j = 1 "
        f"THEN power({b}D, size(arr) - 1) * element_at(arr, 1).y "
        f"ELSE {a}D * power({b}D, size(arr) - j) * element_at(arr, j).y END), "
        "0D, (acc, x) -> acc + x)"
    )
    pexpr = (
        "aggregate(transform(sequence(2, size(arr)), j -> CASE WHEN j = 2 "
        f"THEN power({b}D, size(arr) - 2) "
        "     * datediff(element_at(arr, 2).day, element_at(arr, 1).day) "
        f"ELSE {a}D * power({b}D, size(arr) - j) "
        "     * datediff(element_at(arr, j).day, element_at(arr, j - 1).day) "
        "END), 0D, (acc, x) -> acc + x)"
    )
    s = g.select(
        "user_id",
        F.size("arr").cast("long").alias("n_demands"),
        F.expr(zexpr).alias("z"),
        F.expr(pexpr).alias("p"),
    )
    return s.select(
        "user_id",
        "n_demands",
        r6(F.col("z")).alias("demand_size"),
        r6(F.col("p")).alias("demand_interval"),
        r6(F.col("z") / F.col("p")).alias("forecast_rate"),
    )


# --- model evaluation: calibration + discrimination --------------------------
#
# Target construction for the eval tier: the hashed bag-of-words classifier
# (curation.text_hashed_classifier) predicts quality_prob; "ground truth" is
# whether the document's composite quality heuristic clears the corpus
# lower-median — the distillation-eval framing (does the cheap hashed model
# recover the expensive heuristic?). Both the probabilities and the labels
# are bit-identical cross-engine, so ranks, counts, and the AUC rational are
# exact; only the Brier/mean sums lean on the r6 grid.

_EVAL_QUALITY_SQL = """
      LEAST(CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 64e0,
            1e0) * 0.5e0
      + LEAST(CAST(len(list_intersect(
            list_distinct(string_split_regex(trim(text), '\\s+')),
            ['the', 'and', 'of', 'is', 'a'])) AS DOUBLE) / 3e0, 1e0) * 0.3e0
      + (1e0 - LEAST((CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                      AS DOUBLE)
                      / GREATEST(CAST(length(text) AS DOUBLE), 1e0)) * 1e1,
                     1e0)) * 0.2e0
"""


def _eval_pairs_sql() -> str:
    """Shared oracle CTE block producing j(doc_id, y, p): the classifier
    probability (replicating curation's oracle term-for-term, incl. its
    r6 rounding) joined to the median-threshold label."""
    from .curation import _CLS_BUCKETS, _CLS_MIX, _CLS_WMOD

    return f"""
    WITH q0 AS (
      SELECT doc_id, ({_EVAL_QUALITY_SQL}) AS q FROM documents
    ),
    med AS (
      SELECT q AS m FROM (
        SELECT q, ROW_NUMBER() OVER (ORDER BY q) AS rn,
               COUNT(*) OVER () AS n
        FROM q0
      ) WHERE rn = (n + 1) // 2
    ),
    lab AS (
      SELECT doc_id, CASE WHEN q >= (SELECT m FROM med) THEN 1 ELSE 0 END AS y
      FROM q0
    ),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {_CLS_BUCKETS}
               AS bucket
      FROM tok
    ),
    scored AS (
      SELECT doc_id,
             SUM(CAST((bucket * {_CLS_MIX}) % {_CLS_WMOD} AS DOUBLE)
                 / {_CLS_WMOD}e0 - 5e-1) AS raw,
             COUNT(*) AS n_tokens
      FROM feat GROUP BY 1
    ),
    preds AS (
      SELECT doc_id,
             FLOOR(1e0 / (1e0 + exp(-(raw / n_tokens) * 8e0)) * 1e6 + 0.5)
               / 1e6 AS p
      FROM scored
    ),
    j AS (
      SELECT l.doc_id, l.y, preds.p FROM lab l JOIN preds USING (doc_id)
    )"""


def _eval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_eval_pairs_sql`: (doc_id, y, p)."""
    from pyspark.sql.window import Window

    from ..functions.text import quality_score
    from .curation import text_hashed_classifier

    docs = load_table(spark, sf_dir, "documents")
    q0 = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    # exact lower-median threshold: a full sort for the oracle contract;
    # a production threshold at 100 TB would be a broadcast approx
    # quantile (percentile_approx) — the eval math downstream is
    # unchanged. The sorted frame carries ONE double column.
    wq = Window.orderBy("q")
    med = (
        q0.select(
            "q",
            F.row_number().over(wq).alias("rn"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("q").alias("m"))
    )
    lab = q0.crossJoin(F.broadcast(med)).select(
        "doc_id", F.when(F.col("q") >= F.col("m"), 1).otherwise(0).alias("y")
    )
    preds = text_hashed_classifier(spark, sf_dir).select(
        "doc_id", F.col("quality_prob").alias("p")
    )
    return lab.join(preds, "doc_id").select("doc_id", "y", "p")


@register(
    "ml_classifier_auc",
    tags=("ml", "aggregate", "eval"),
    oracle=_eval_pairs_sql()
    + """,
    r AS (
      SELECT y, p,
             RANK() OVER (ORDER BY p) AS rmin,
             COUNT(*) OVER (PARTITION BY p) AS cnt
      FROM j
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg,
             SUM(CASE WHEN y = 1 THEN rmin + (cnt - 1) / 2e0 ELSE 0e0 END)
               AS sumr,
             SUM((p - y) * (p - y)) AS brier_sum
      FROM r
    )
    SELECT n, n_pos, n_neg,
           FLOOR((sumr - n_pos * (n_pos + 1) / 2e0)
                 / (CAST(n_pos AS DOUBLE) * n_neg) * 1e6 + 0.5) / 1e6 AS auc,
           FLOOR(brier_sum / n * 1e6 + 0.5) / 1e6 AS brier
    FROM s
    """,
)
def ml_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier discrimination + accuracy summary: tie-aware rank-based
    ROC AUC (the Mann-Whitney identity AUC = (Σ ranks_pos − n₁(n₁+1)/2)
    / n₁n₀ with average ranks for ties — exact, no curve integration)
    and the Brier score, for the hashed quality classifier against the
    median-quality distillation target. Cross-engine exactness: min-rank
    + tie-count are integers over bit-identical probabilities, average
    ranks are exact half-integers whose sum is order-independent in
    doubles, so AUC is the identical rational on both engines; the Brier
    sum alone rides the r6 grid. Engine shape: one rank window over the
    probability order + one global aggregate; the label median is the
    one full sort (documented: approx-quantile at 100 TB). Output: one
    row (n, n_pos, n_neg, auc, brier)."""
    tune(spark)
    from pyspark.sql.window import Window

    jf = _eval_pairs(spark, sf_dir)
    r = jf.select(
        "y",
        "p",
        F.rank().over(Window.orderBy("p")).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("p")).alias("cnt"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("rmin") + (F.col("cnt") - 1) / F.lit(2.0),
            ).otherwise(F.lit(0.0))
        ).alias("sumr"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "brier_sum"
        ),
    )
    return s.select(
        "n",
        "n_pos",
        "n_neg",
        r6(
            (F.col("sumr") - F.col("n_pos") * (F.col("n_pos") + 1) / F.lit(2.0))
            / (F.col("n_pos").cast("double") * F.col("n_neg"))
        ).alias("auc"),
        r6(F.col("brier_sum") / F.col("n")).alias("brier"),
    )


@register(
    "ml_reliability_bins",
    tags=("ml", "aggregate", "eval"),
    oracle=_eval_pairs_sql()
    + """
    SELECT CAST(LEAST(CAST(FLOOR(p * 10e0) AS BIGINT) + 1, 10) AS BIGINT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(p) * 1e6 + 0.5) / 1e6 AS mean_prob,
           FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
             AS frac_positive
    FROM j GROUP BY 1
    """,
)
def ml_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) for the hashed quality
    classifier: predictions bucket into 10 equal-width probability bins;
    each bin reports its size, mean predicted probability, and observed
    positive rate — a calibrated model has mean_prob ≈ frac_positive per
    bin (the curve isotonic regression / Platt scaling would then fit;
    ml_isotonic_trend is the in-repo calibrator). Counts and the
    frac_positive rational are exact; mean_prob rides the r6 grid.
    Engine shape: one map-side-combinable groupBy over the bin id —
    beyond the shared pair construction, the cheapest eval in the
    stack."""
    tune(spark)
    jf = _eval_pairs(spark, sf_dir)
    return jf.groupBy(
        F.least(
            F.floor(F.col("p") * 10.0).cast("long") + 1, F.lit(10)
        ).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        r6(F.avg("p")).alias("mean_prob"),
        r6(F.sum("y").cast("double") / F.count(F.lit(1))).alias(
            "frac_positive"
        ),
    )


# --- classifier operating points: confusion-matrix threshold sweep -----------

_SWEEP_THRESHOLDS = "[0.1e0, 0.2e0, 0.3e0, 0.4e0, 0.5e0, 0.6e0, 0.7e0, 0.8e0, 0.9e0]"


@register(
    "ml_threshold_sweep",
    tags=("ml", "aggregate", "eval"),
    oracle=_eval_pairs_sql()
    + f""",
    cells AS (
      SELECT t.thr,
             CAST(SUM(CASE WHEN p >= t.thr AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN p >= t.thr AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN p < t.thr AND y = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN p < t.thr AND y = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM j CROSS JOIN (SELECT unnest({_SWEEP_THRESHOLDS}) AS thr) t
      GROUP BY 1
    )
    SELECT FLOOR(thr * 1e6 + 0.5) / 1e6 AS threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN FLOOR(CAST(tp AS DOUBLE) / (tp + fp) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS precision_,
           CASE WHEN tp + fn > 0
                THEN FLOOR(CAST(tp AS DOUBLE) / (tp + fn) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS recall_,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN FLOOR(2e0 * tp / (2 * tp + fp + fn) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS f1,
           FLOOR(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) * 1e6 + 0.5)
             / 1e6 AS accuracy
    FROM cells
    """,
)
def ml_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier operating-point sweep: the confusion matrix (TP/FP/FN/TN)
    plus precision / recall / F1 / accuracy of the hashed quality
    classifier against the median-quality distillation target, at a
    literal ladder of 9 probability thresholds — the operating-curve
    complement to ml_classifier_auc's single threshold-free scalar (AUC
    says the ranking is good; this says which cut to deploy). F1 uses
    the exact-rational identity 2TP/(2TP+FP+FN), so every metric is a
    ratio of exact integers — identical doubles on both engines before
    the r6 grid. Engine shape: ONE pass over the (doc, y, p) pairs with
    a 9-row literal-array cross join expanded in-row, then a
    map-side-combinable groupBy to 9 rows — sweeping more thresholds
    changes only the literal, never the shuffle count; at 100 TB this
    costs the same as a single-threshold confusion matrix."""
    tune(spark)
    jf = _eval_pairs(spark, sf_dir)
    thr = F.explode(
        F.array([F.lit(x / 10.0) for x in range(1, 10)])
    ).alias("thr")
    cells = (
        jf.select("y", "p", thr)
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("p") >= F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).cast("long").alias("tp"),
            F.sum(
                F.when((F.col("p") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("fp"),
            F.sum(
                F.when((F.col("p") < F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).cast("long").alias("fn"),
            F.sum(
                F.when((F.col("p") < F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("tn"),
        )
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cells.select(
        r6(F.col("thr")).alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(tp + fp > 0, r6(tp.cast("double") / (tp + fp)))
        .otherwise(F.lit(None).cast("double"))
        .alias("precision_"),
        F.when(tp + fn > 0, r6(tp.cast("double") / (tp + fn)))
        .otherwise(F.lit(None).cast("double"))
        .alias("recall_"),
        F.when(
            2 * tp + fp + fn > 0,
            r6(F.lit(2.0) * tp / (2 * tp + fp + fn)),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("f1"),
        r6((tp + tn).cast("double") / (tp + fp + fn + tn)).alias("accuracy"),
    )


# --- feature engineering: leakage-safe target encoding -----------------------

_TE_FOLDS = 4
_TE_SMOOTH = 10  # additive-smoothing pseudo-count toward the global mean


@register(
    "ml_target_encoding",
    tags=("ml", "aggregate", "features"),
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS cat, o_totalprice AS y,
             CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_TE_FOLDS} AS fold
      FROM orders
    ),
    cf AS (
      SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS s
      FROM base GROUP BY 1, 2
    ),
    ct AS (
      SELECT cat, CAST(SUM(n) AS BIGINT) AS n_cat, SUM(s) AS s_cat
      FROM cf GROUP BY 1
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all, SUM(s) AS s_all FROM cf
    )
    SELECT cf.cat, CAST(cf.fold AS BIGINT) AS fold, cf.n AS n_in_fold,
           CAST(ct.n_cat - cf.n AS BIGINT) AS n_oof,
           FLOOR(((ct.s_cat - cf.s)
                  + {_TE_SMOOTH}e0 * ((g.s_all - cf.s) / (g.n_all - cf.n)))
                 / ((ct.n_cat - cf.n) + {_TE_SMOOTH}e0) * 1e4 + 0.5) / 1e4
             AS encoded
    FROM cf JOIN ct USING (cat) CROSS JOIN g
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding of a categorical
    feature: rows split into {k} deterministic md5 folds; the encoding a
    fold's rows would receive is the SMOOTHED mean of the target over
    the category's rows in the OTHER folds — (s_oof + m·ȳ_oof)/(n_oof +
    m), m={m} — the standard K-fold mean-encoding recipe that prevents a
    row's own target from leaking into its feature (the
    train-time complement of the hashed-feature inference tier). Output
    is the (category, fold) encoding table a join would apply
    row-level. Cross-engine: fold ids and counts are exact integers;
    the target sums are engine-ordered doubles behind the r4 grid.
    Engine shape: ONE map-side-combinable groupBy((cat, fold)) —
    category and global totals derive from the collapsed frame, so
    nothing row-sized is ever re-shuffled; at 100 TB the whole encoder
    is |cats|×{k} rows after the first aggregate."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % _TE_FOLDS
    )
    cf = orders.groupBy(
        F.col("o_orderpriority").alias("cat"), fold.alias("fold")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("o_totalprice").alias("s"),
    )
    ct = cf.groupBy("cat").agg(
        F.sum("n").cast("long").alias("n_cat"), F.sum("s").alias("s_cat")
    )
    g = cf.agg(
        F.sum("n").cast("long").alias("n_all"), F.sum("s").alias("s_all")
    )
    oof_mean = (F.col("s_all") - F.col("s")) / (F.col("n_all") - F.col("n"))
    return (
        cf.join(F.broadcast(ct), "cat")
        .crossJoin(F.broadcast(g))
        .select(
            "cat",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").alias("n_in_fold"),
            (F.col("n_cat") - F.col("n")).cast("long").alias("n_oof"),
            r4(
                (
                    (F.col("s_cat") - F.col("s"))
                    + F.lit(float(_TE_SMOOTH)) * oof_mean
                )
                / ((F.col("n_cat") - F.col("n")) + F.lit(float(_TE_SMOOTH)))
            ).alias("encoded"),
        )
    )


fmt_doc(ml_target_encoding, 
    k=_TE_FOLDS, m=_TE_SMOOTH
)


# --- Murphy decomposition of the Brier score ---------------------------------


@register(
    "ml_brier_decomposition",
    tags=("ml", "aggregate", "eval"),
    oracle=_eval_pairs_sql()
    + """
    , binned AS (
      SELECT CAST(LEAST(CAST(FLOOR(p * 10e0) AS BIGINT) + 1, 10) AS BIGINT)
               AS bin,
             CAST(FLOOR(p * 1e9 + 0.5) AS BIGINT) AS pq,
             y,
             CAST(FLOOR((p - y) * (p - y) * 1e9 + 0.5) AS BIGINT) AS sqq
      FROM j
    ),
    per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pq) AS BIGINT) AS spq,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM binned GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(sy) AS BIGINT) AS syt,
             (SELECT CAST(SUM(sqq) AS BIGINT) FROM binned) AS sbq
      FROM per_bin
    ),
    terms AS (
      SELECT t.nn, t.sbq,
             CAST(SUM(CAST(FLOOR(
               b.n * (CAST(b.spq AS DOUBLE) / b.n / 1e9
                      - CAST(b.sy AS DOUBLE) / b.n)
                   * (CAST(b.spq AS DOUBLE) / b.n / 1e9
                      - CAST(b.sy AS DOUBLE) / b.n) * 1e9 + 0.5) AS BIGINT))
               AS BIGINT) AS relq,
             CAST(SUM(CAST(FLOOR(
               b.n * (CAST(b.sy AS DOUBLE) / b.n
                      - CAST(t.syt AS DOUBLE) / t.nn)
                   * (CAST(b.sy AS DOUBLE) / b.n
                      - CAST(t.syt AS DOUBLE) / t.nn) * 1e9 + 0.5) AS BIGINT))
               AS BIGINT) AS resq,
             CAST(t.syt AS DOUBLE) / t.nn AS obar
      FROM per_bin b CROSS JOIN tot t
      GROUP BY 1, 2, 5
    )
    SELECT nn AS n,
           FLOOR(CAST(sbq AS DOUBLE) / nn / 1e9 * 1e6 + 0.5) / 1e6 AS brier,
           FLOOR(CAST(relq AS DOUBLE) / nn / 1e9 * 1e6 + 0.5) / 1e6
             AS reliability,
           FLOOR(CAST(resq AS DOUBLE) / nn / 1e9 * 1e6 + 0.5) / 1e6
             AS resolution,
           FLOOR(obar * (1e0 - obar) * 1e6 + 0.5) / 1e6 AS uncertainty,
           FLOOR((CAST(sbq AS DOUBLE) / nn / 1e9
                  - (CAST(relq AS DOUBLE) / nn / 1e9
                     - CAST(resq AS DOUBLE) / nn / 1e9
                     + obar * (1e0 - obar))) * 1e6 + 0.5) / 1e6
             AS residual
    FROM terms
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the hashed classifier's Brier score over
    the 10 reliability bins: Brier ≈ REL - RES + UNC (Murphy 1973) —
    reliability (calibration badness), resolution (how much the bins
    separate outcomes), uncertainty (outcome base-rate variance), plus
    the explicit residual (within-bin forecast variance, nonzero
    whenever p varies inside a bin — emitting it keeps the identity
    honest instead of pretending the textbook 3-term form is exact).
    Shares the exact pair construction and binning of
    ml_reliability_bins. Exactness: y-sums and counts are BIGINT; p and
    (p-y)² quantize per ROW at 1e9 (so bin means are exact integer
    ratios); each bin's REL/RES term quantizes at 1e9 before the final
    BIGINT sum. One bin aggregate + one 10-row reduce."""
    tune(spark)
    jf = _eval_pairs(spark, sf_dir)
    binned = jf.select(
        F.least(F.floor(F.col("p") * 10.0).cast("long") + 1, F.lit(10))
        .cast("long")
        .alias("bin"),
        F.floor(F.col("p") * 1e9 + F.lit(0.5)).cast("long").alias("pq"),
        "y",
        F.floor(
            (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")) * 1e9
            + F.lit(0.5)
        )
        .cast("long")
        .alias("sqq"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pq").cast("long").alias("spq"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("sqq").cast("long").alias("sbq_bin"),
    )
    tot = per_bin.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("sy").cast("long").alias("syt"),
        F.sum("sbq_bin").cast("long").alias("sbq"),
    )
    pbar = F.col("spq").cast("double") / F.col("n") / 1e9
    obin = F.col("sy").cast("double") / F.col("n")
    obar = F.col("syt").cast("double") / F.col("nn")
    terms = (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "nn",
            "sbq",
            obar.alias("obar"),
            F.floor(
                F.col("n") * (pbar - obin) * (pbar - obin) * 1e9 + F.lit(0.5)
            )
            .cast("long")
            .alias("relq_t"),
            F.floor(
                F.col("n") * (obin - obar) * (obin - obar) * 1e9 + F.lit(0.5)
            )
            .cast("long")
            .alias("resq_t"),
        )
        .groupBy("nn", "sbq", "obar")
        .agg(
            F.sum("relq_t").cast("long").alias("relq"),
            F.sum("resq_t").cast("long").alias("resq"),
        )
    )
    b6 = lambda q: F.floor(  # noqa: E731
        q.cast("double") / F.col("nn") / 1e9 * 1e6 + F.lit(0.5)
    ) / 1e6
    brier = F.col("sbq").cast("double") / F.col("nn") / 1e9
    rel = F.col("relq").cast("double") / F.col("nn") / 1e9
    res = F.col("resq").cast("double") / F.col("nn") / 1e9
    unc = F.col("obar") * (F.lit(1e0) - F.col("obar"))
    return terms.select(
        F.col("nn").alias("n"),
        b6(F.col("sbq")).alias("brier"),
        b6(F.col("relq")).alias("reliability"),
        b6(F.col("resq")).alias("resolution"),
        (F.floor(unc * 1e6 + F.lit(0.5)) / 1e6).alias("uncertainty"),
        (
            F.floor((brier - (rel - res + unc)) * 1e6 + F.lit(0.5)) / 1e6
        ).alias("residual"),
    )


# --- McNemar paired-classifier test ------------------------------------------------

_MCN_CRIT = "3.841458820694124e0"  # chi2_{0.95, df=1}


@register(
    "ml_mcnemar_paired",
    tags=("ml", "statistics", "eval"),
    oracle=_eval_pairs_sql()
    + """
    , lenr AS (
      SELECT d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (ORDER BY d.n_chars, d.doc_id) AS r,
             COUNT(*) OVER () AS n
      FROM documents d
    ),
    lmed AS (
      SELECT n_chars AS med_chars FROM lenr
      WHERE r = CAST(CEIL(n * 0.5) AS BIGINT)
    ),
    mc_preds AS (
      SELECT j.doc_id, j.y,
             CASE WHEN j.p > 0.5 THEN 1 ELSE 0 END AS pa,
             CASE WHEN d.n_chars > m.med_chars THEN 1 ELSE 0 END AS pb
      FROM j
      JOIN documents d ON d.doc_id = j.doc_id
      CROSS JOIN lmed m
    ),
    mc_cells AS (
      SELECT
        CAST(SUM(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END) AS BIGINT)
          AS n_both,
        CAST(SUM(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT)
          AS n10,
        CAST(SUM(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT)
          AS n01,
        CAST(SUM(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT)
          AS n_neither,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM mc_preds
    )
    SELECT n, n_both, n10 AS n_a_only, n01 AS n_b_only, n_neither,
           FLOOR(GREATEST(ABS(CAST(n10 - n01 AS DOUBLE)) - 1e0, 0e0)
                 * GREATEST(ABS(CAST(n10 - n01 AS DOUBLE)) - 1e0, 0e0)
                 / GREATEST(n10 + n01, 1) * 1e4 + 0.5) / 1e4 AS chi_square,
           CAST(GREATEST(ABS(CAST(n10 - n01 AS DOUBLE)) - 1e0, 0e0)
                * GREATEST(ABS(CAST(n10 - n01 AS DOUBLE)) - 1e0, 0e0)
                / GREATEST(n10 + n01, 1) > """
    + _MCN_CRIT
    + """ AS BOOLEAN)
             AS significant
    FROM mc_cells
    """,
)
def ml_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test between two classifiers of the SAME documents
    on the SAME labels — the hashed-feature classifier (p > 0.5) vs the
    naive length rule (chars > corpus median): the discordant cells
    n_a_only / n_b_only carry all the information, chi-square with
    continuity correction max(|b-c|-1, 0)²/(b+c) against 3.841 (McNemar
    1947; the correction is capped so b == c yields exactly 0)
    — the statistically correct way to claim "model A beats model B"
    on a shared eval set (a two-proportion test on accuracies ignores
    the pairing and overstates significance). Shares _eval_pairs with
    the AUC/calibration tier; the median length is a rank-picked exact
    order statistic. All cells BIGINT; the statistic is one IEEE
    expression. One scoring pass + one median window + one reduce."""
    tune(spark)
    jf = _eval_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    wr = Window.orderBy("n_chars", "doc_id")
    wn = Window.partitionBy()
    lenr = docs.select(
        "n_chars",
        F.row_number().over(wr).cast("long").alias("r"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    med = lenr.filter(
        F.col("r") == F.ceil(F.col("n") * 0.5).cast("long")
    ).select(F.col("n_chars").alias("med_chars"))
    preds = (
        jf.join(docs, "doc_id")
        .crossJoin(F.broadcast(med))
        .select(
            "y",
            F.when(F.col("p") > 0.5, 1).otherwise(0).alias("pa"),
            F.when(F.col("n_chars") > F.col("med_chars"), 1)
            .otherwise(0)
            .alias("pb"),
        )
    )
    cells = preds.agg(
        F.sum(
            F.when((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
        F.sum(
            F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n10"),
        F.sum(
            F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n01"),
        F.sum(
            F.when((F.col("pa") != F.col("y")) & (F.col("pb") != F.col("y")), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_neither"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # Continuity correction capped at 0 (standard convention caps |b-c|-1
    # at |b-c|; with the square that reduces to GREATEST(.., 0)): at the
    # b == c edge the statistic is exactly 0, not 1/(b+c).
    corr = F.greatest(
        F.abs((F.col("n10") - F.col("n01")).cast("double")) - F.lit(1e0),
        F.lit(0e0),
    )
    stat = corr * corr / F.greatest(F.col("n10") + F.col("n01"), F.lit(1))
    return cells.select(
        "n",
        "n_both",
        F.col("n10").alias("n_a_only"),
        F.col("n01").alias("n_b_only"),
        "n_neither",
        (F.floor(stat * 1e4 + F.lit(0.5)) / 1e4).alias("chi_square"),
        (stat > float(_MCN_CRIT)).alias("significant"),
    )
