"""Statistical-testing and model/retrieval EVALUATION operators (round-7
continuation widening).

Capability families a production analytics engine needs on top of the
reference's surface (the reference — satya-dataengineer/move-forecast-IND —
has none of these; engine-completeness mandate) and on top of the existing
hypothesis-test tier (Welch t / KS / Mann-Whitney / chi-square / z) and the
model-evaluation tier (AUC / Brier / reliability bins):

- rank correlation: Spearman's rho per segment, computed from EXACT integer
  doubled-average-ranks so both engines derive the identical double before
  the rounding grid (no float ordering anywhere in the rank pipeline);
- one-way ANOVA: day-of-week effect on purchase value, classic F statistic
  from exact integer-cents group moments;
- multiple-testing control: per-nation mean z-tests -> Benjamini-Hochberg
  step-up FDR flags, with the normal CDF evaluated through the SAME
  Abramowitz-Stegun 7.1.26 polynomial text on both engines;
- privacy: l-diversity audit (distinct + entropy l) over the k-anonymity
  tier's equivalence classes — k-anonymity bounds class SIZE, l-diversity
  bounds what a class leaks about the SENSITIVE attribute;
- retrieval evaluation: graded-relevance NDCG@k for the semantic
  more-like-this ranking (the measurement leg of the RRF/MMR stack);
- classifier operating points: confusion-matrix threshold sweep
  (precision / recall / F1 / accuracy at a literal threshold ladder) —
  the operating-curve complement to the single-scalar AUC;
- forecast evaluation: pinball (quantile) loss for per-day-of-week
  empirical-quantile forecasts — the standard scoring rule for
  probabilistic forecasts, over the same train/test split as
  ml_forecast_backtest.

All hot paths are built-in column expressions inside whole-stage codegen;
ranks, counts, and confusion cells are exact integers; every double that
reaches the output is rounded through ``functions.rounding`` on BOTH
engines so aggregation-order ulp noise can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import r4, r6, sql_r4, sql_r6
from ..functions.vectors import as_double, cosine
from ..session import tune
from ..sources import load_table
from .registry import register

# --- Spearman rank correlation ----------------------------------------------


def _cents(c) -> F.Column:
    """Exact integer cents: FLOOR(x*100+0.5) — identical in both engines."""
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")


@register(
    "a_spearman_rank",
    tags=("aggregate", "statistics"),
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 1e2 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(c.c_acctbal * 1e2 + 0.5) AS BIGINT) AS x,
             COALESCE(s.y, 0) AS y
      FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
    ),
    rk AS (
      SELECT seg,
             2 * RANK() OVER (PARTITION BY seg ORDER BY x)
               + COUNT(*) OVER (PARTITION BY seg, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY seg ORDER BY y)
               + COUNT(*) OVER (PARTITION BY seg, y) - 1 AS ry
      FROM base
    ),
    m AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy
      FROM rk GROUP BY 1
    )
    SELECT seg AS c_mktsegment, n,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                     (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0e0
                THEN FLOOR((CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS rho_spearman
    FROM m
    """,
)
def a_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (per market segment) between a customer's
    account balance and their lifetime order spend — the robust,
    monotonic-association complement to a_corr_covar's Pearson tier.
    Average ranks for ties are kept EXACT by doubling: avg_rank*2 =
    2*rank_min + tie_count - 1 is an integer, invariant to the x2 scaling
    that Pearson-on-ranks ignores, so the whole rank pipeline is integer
    arithmetic (spend is summed in exact integer cents — no float
    ordering can flip a rank). rho is then formed once per segment from
    five exact BIGINT moments cast to double with an identical op
    sequence on both engines — bit-exact before the r6 grid; a
    zero-variance segment (all ties) yields NULL. Engine shape: one
    broadcast-sized spend aggregate joined to the customer master, two
    rank windows per segment partition, one groupBy — at 100 TB the rank
    windows are the only data-sized shuffles and they partition by
    segment; a skewed segment would switch to the range-partitioned sort
    the windows already imply."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("y")
    )
    base = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            _cents(F.col("c_acctbal")).alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    rx = (
        F.lit(2) * F.rank().over(Window.partitionBy("seg").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("seg", "x"))
        - F.lit(1)
    )
    ry = (
        F.lit(2) * F.rank().over(Window.partitionBy("seg").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("seg", "y"))
        - F.lit(1)
    )
    rk = base.select("seg", rx.alias("rx"), ry.alias("ry"))
    m = rk.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    cov = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    return m.select(
        F.col("seg").alias("c_mktsegment"),
        "n",
        F.when(vx * vy > 0.0, r6(cov / F.sqrt(vx * vy)))
        .otherwise(F.lit(None).cast("double"))
        .alias("rho_spearman"),
    )


# --- one-way ANOVA: day-of-week effect on purchase value ---------------------


@register(
    "a_anova_dow_f",
    tags=("aggregate", "statistics"),
    oracle="""
    WITH v AS (
      SELECT isodow(ts) AS dow,
             CAST(FLOOR(value * 1e2 + 0.5) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(c) AS BIGINT) AS s_g,
             CAST(SUM(c * c) AS BIGINT) AS q_g
      FROM v GROUP BY 1
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM(q_g) AS BIGINT) AS q,
             SUM(CAST(s_g AS DOUBLE) * s_g / n_g) AS between_raw
      FROM g
    )
    SELECT k, n,
           FLOOR((between_raw - CAST(s AS DOUBLE) * s / n) / 1e4
                 * 1e4 + 0.5) / 1e4 AS ss_between,
           FLOOR((CAST(q AS DOUBLE) - between_raw) / 1e4
                 * 1e4 + 0.5) / 1e4 AS ss_within,
           FLOOR(((between_raw - CAST(s AS DOUBLE) * s / n) / (k - 1))
                 / ((CAST(q AS DOUBLE) - between_raw) / (n - k))
                 * 1e6 + 0.5) / 1e6 AS f_stat,
           FLOOR((between_raw - CAST(s AS DOUBLE) * s / n)
                 / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 * 1e6 + 0.5) / 1e6 AS eta_squared
    FROM t
    """,
)
def a_anova_dow_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does purchase value differ by ISO day-of-week?
    Classic decomposition SST = SSB + SSW from per-group moments, all
    carried as EXACT integer cents (n_g, sum, sum-of-squares are BIGINT;
    with |value| <= ~1e4 currency units the squared-cents sum stays under
    2^63 past sf1 — documented bound, same contract as the quantized
    training fit). The only doubles are the final ratio assembly: the
    one order-sensitive term (SUM over the 7 group rows of s_g^2/n_g)
    spans 7 near-equal positive terms, so fold-order noise is a few ulps
    against an r4/r6 grid — orders of magnitude of margin. SS columns
    are reported in currency^2 units (cents^2 / 1e4). Engine shape: one
    map-side-combinable groupBy to 7 rows, then a one-row global
    aggregate — two metadata-scale shuffles regardless of table size;
    this is the cheapest possible ANOVA plan at 100 TB."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "purchase").select(
        (F.weekday("ts") + F.lit(1)).alias("dow"),
        _cents(F.col("value")).alias("c"),
    )
    g = v.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("c").cast("long").alias("s_g"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q_g"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("q_g").cast("long").alias("q"),
        F.sum(
            F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
        ).alias("between_raw"),
    )
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    ssb = F.col("between_raw") - sd * sd / F.col("n")
    ssw = qd - F.col("between_raw")
    sst = qd - sd * sd / F.col("n")
    return t.select(
        "k",
        "n",
        r4(ssb / F.lit(1e4)).alias("ss_between"),
        r4(ssw / F.lit(1e4)).alias("ss_within"),
        r6((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))).alias(
            "f_stat"
        ),
        r6(ssb / sst).alias("eta_squared"),
    )


# --- l-diversity privacy audit ----------------------------------------------

_LDIV_L = 3


@register(
    "dq_l_diversity",
    tags=("dq", "aggregate", "privacy"),
    oracle=f"""
    WITH cells AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 1000e0) AS BIGINT) AS bal_band,
             c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3
    ),
    withp AS (
      SELECT c_nationkey, bal_band, cnt,
             CAST(cnt AS DOUBLE)
               / SUM(cnt) OVER (PARTITION BY c_nationkey, bal_band) AS p
      FROM cells
    ),
    cls AS (
      SELECT c_nationkey, bal_band,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS l_distinct,
             SUM(p * ln(p)) AS negent
      FROM withp GROUP BY 1, 2
    )
    SELECT c_nationkey, bal_band, n, l_distinct,
           FLOOR(exp(-negent) * 1e6 + 0.5) / 1e6 AS entropy_l,
           l_distinct >= {_LDIV_L} AS l_diverse
    FROM cls
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) over the customer
    master: for each quasi-identifier equivalence class (nation,
    account-balance band), how many DISTINCT values of the sensitive
    attribute (market segment) appear (distinct l-diversity) and the
    entropy l  = exp(H) of the within-class sensitive distribution
    (entropy l-diversity) — the attribute-disclosure complement to
    dq_k_anonymity, which only bounds class size: a class of 1000 rows
    that all share one segment is 1000-anonymous yet leaks the segment
    with certainty. Cross-engine: class and cell counts are exact
    integers; H sums <= |segments| = 5 near-equal p*ln(p) terms, ulp
    noise far inside the r6 grid. Engine shape: one groupBy to
    (QI x sensitive) cells — one shuffle carrying one row per cell —
    then a metadata-scale re-group to classes; at 100 TB this runs at
    the same cost as the k-anonymity audit it extends."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcls = Window.partitionBy("c_nationkey", "bal_band")
    p = F.col("cnt").cast("double") / F.sum("cnt").over(wcls)
    cells = cells.withColumn("plogp", p * F.log(p))
    cls = cells.groupBy("c_nationkey", "bal_band").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.sum("plogp").alias("negent"),
    )
    return cls.select(
        "c_nationkey",
        "bal_band",
        "n",
        "l_distinct",
        r6(F.exp(-F.col("negent"))).alias("entropy_l"),
        (F.col("l_distinct") >= _LDIV_L).alias("l_diverse"),
    )


# --- retrieval evaluation: graded-relevance NDCG@k ---------------------------

_NDCG_K = 10
_NDCG_QUERIES = 5  # vec_id < 5, matching the sim_ann_* query convention


@register(
    "ml_ndcg_eval",
    tags=("ml", "similarity", "eval"),
    oracle=f"""
    WITH v AS (
      SELECT e.vec_id, e.embedding::DOUBLE[] AS vec, e.label, d.source
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    ),
    q AS (SELECT * FROM v WHERE vec_id < {_NDCG_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_inner_product(q.vec, c.vec)
               / (sqrt(list_inner_product(q.vec, q.vec))
                  * sqrt(list_inner_product(c.vec, c.vec))) AS cos,
             (CASE WHEN q.label = c.label THEN 2 ELSE 0 END
              + CASE WHEN q.source = c.source THEN 1 ELSE 0 END) AS rel
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, rel,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS pos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rel DESC, cand_id) AS ideal_pos
      FROM scored
    ),
    dcg AS (
      SELECT query_id,
             SUM(CASE WHEN pos <= {_NDCG_K}
                      THEN (pow(2e0, rel) - 1e0)
                           / (ln(CAST(pos + 1 AS DOUBLE)) / ln(2e0))
                      ELSE 0e0 END) AS dcg,
             SUM(CASE WHEN ideal_pos <= {_NDCG_K}
                      THEN (pow(2e0, rel) - 1e0)
                           / (ln(CAST(ideal_pos + 1 AS DOUBLE)) / ln(2e0))
                      ELSE 0e0 END) AS idcg,
             CAST(SUM(CASE WHEN pos <= {_NDCG_K} AND rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_in_k
      FROM ranked GROUP BY 1
    )
    SELECT query_id, n_rel_in_k,
           FLOOR(dcg * 1e6 + 0.5) / 1e6 AS dcg,
           FLOOR(idcg * 1e6 + 0.5) / 1e6 AS idcg,
           CASE WHEN idcg > 0e0
                THEN FLOOR(dcg / idcg * 1e6 + 0.5) / 1e6
                ELSE 0e0 END AS ndcg
    FROM dcg
    """,
)
def ml_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded-relevance NDCG@{k} (Jarvelin & Kekalainen 2002) for the
    semantic more-like-this ranking: each of the {nq} standard query
    vectors ranks the rest of the corpus by exact cosine; relevance
    grades derive deterministically from metadata (same embedding label
    = +2, same document source = +1 — grades 0..3), IDCG is the
    same gain sum over the relevance-sorted ideal ordering, and
    NDCG = DCG/IDCG. This is the measurement leg of the retrieval stack
    (RRF fusion and MMR reorder candidates; this scores a ranking) —
    run it on an ANN variant vs this exact ranking and the NDCG delta
    IS the recall/quality cost of the index. Cross-engine: cosines ride
    the shared left-fold dot product (bit-identical to DuckDB's
    list_inner_product), ordering ties break on candidate id, gains are
    integer powers of two, and the <= {k}-term gain sums sit far inside
    the r6 grid. Engine shape: the {nq}-row query side broadcasts; the
    corpus never shuffles for scoring; per-query ranking is a window
    over candidate partitions. At 100 TB the exact leg bounds to top-k
    per partition via TakeOrdered; the ANN legs (sim_ann_lsh / ivf)
    are the production path this evaluator certifies."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    v = emb.join(docs, "vec_id").select(
        "vec_id", as_double(F.col("embedding")).alias("vec"), "label", "source"
    )
    q = v.filter(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("label").alias("qlabel"),
        F.col("source").alias("qsource"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            cosine(F.col("qvec"), F.col("vec")).alias("cos"),
            (
                F.when(F.col("qlabel") == F.col("label"), 2).otherwise(0)
                + F.when(F.col("qsource") == F.col("source"), 1).otherwise(0)
            ).alias("rel"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("cand_id")
    )
    ranked = scored.select(
        "query_id",
        "rel",
        F.row_number().over(wr).alias("pos"),
        F.row_number().over(wi).alias("ideal_pos"),
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0))
    dcg = ranked.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("pos") <= _NDCG_K,
                gain / (F.log(F.col("pos").cast("double") + 1) / F.log(F.lit(2.0))),
            ).otherwise(F.lit(0.0))
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_pos") <= _NDCG_K,
                gain
                / (F.log(F.col("ideal_pos").cast("double") + 1) / F.log(F.lit(2.0))),
            ).otherwise(F.lit(0.0))
        ).alias("idcg"),
        F.sum(
            F.when((F.col("pos") <= _NDCG_K) & (F.col("rel") > 0), 1).otherwise(0)
        ).cast("long").alias("n_rel_in_k"),
    )
    return dcg.select(
        "query_id",
        "n_rel_in_k",
        r6(F.col("dcg")).alias("dcg"),
        r6(F.col("idcg")).alias("idcg"),
        F.when(F.col("idcg") > 0.0, r6(F.col("dcg") / F.col("idcg")))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


ml_ndcg_eval.__doc__ = ml_ndcg_eval.__doc__.format(k=_NDCG_K, nq=_NDCG_QUERIES)


# --- forecast evaluation: pinball (quantile) loss ----------------------------

_PINBALL_QS = (0.1, 0.5, 0.9)
_PINBALL_HOLDOUT_DAYS = 7  # matches ml_forecast_backtest's split


@register(
    "ml_pinball_loss",
    tags=("ml", "timeseries", "forecast", "eval"),
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    cutoff AS (SELECT MAX(day) - {_PINBALL_HOLDOUT_DAYS} AS cut FROM daily),
    train AS (
      SELECT isodow(day) AS dow, y FROM daily CROSS JOIN cutoff
      WHERE day <= cut
    ),
    test AS (
      SELECT isodow(day) AS dow, day, y FROM daily CROSS JOIN cutoff
      WHERE day > cut
    ),
    ranked AS (
      SELECT dow, y,
             ROW_NUMBER() OVER (PARTITION BY dow ORDER BY y) AS rn,
             COUNT(*) OVER (PARTITION BY dow) AS n
      FROM train
    ),
    fc AS (
      SELECT r.dow, t.q, r.y AS f
      FROM ranked r
      CROSS JOIN (SELECT unnest([{", ".join(f"{q}e0" for q in _PINBALL_QS)}])
                    AS q) t
      WHERE r.rn = GREATEST(1, CAST(CEIL(t.q * r.n) AS BIGINT))
    ),
    scored AS (
      SELECT fc.q, t.y, fc.f,
             CASE WHEN t.y >= fc.f THEN fc.q * (t.y - fc.f)
                  ELSE (1e0 - fc.q) * (fc.f - t.y) END AS loss,
             CASE WHEN t.y <= fc.f THEN 1 ELSE 0 END AS covered
      FROM test t JOIN fc ON fc.dow = t.dow
    )
    SELECT FLOOR(q * 1e6 + 0.5) / 1e6 AS quantile,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           FLOOR(AVG(loss) * 1e6 + 0.5) / 1e6 AS mean_pinball,
           FLOOR(CAST(SUM(covered) AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6
             AS coverage
    FROM scored GROUP BY q
    """,
)
def ml_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss backtest: hold out the last {h} days
    (ml_forecast_backtest's split), forecast each test day's event count
    with the per-ISO-day-of-week EXACT empirical train quantile at
    q in {qs} (order statistic at rank ceil(q*n) — integer counts, so
    forecasts are exact integers), and score with the pinball rule
    L_q(y,f) = q(y-f) if y>=f else (1-q)(f-y) — the proper scoring rule
    for quantile forecasts that MAE/MAPE point backtests can't grade;
    coverage (frac of test days with y <= f) checks calibration (should
    be ~q). Cross-engine: ranks, counts, and forecasts are exact
    integers; per-row losses are products of a literal and an integer —
    identical doubles — and only the <= {h}-term mean rides the r6 grid.
    Engine shape: one groupBy to the daily frame, one rank window per
    dow partition over the (tiny) training days, a broadcast join of
    the 21-row forecast table to the test days — at 100 TB the daily
    collapse is the only data-sized stage (same posture as the whole
    forecast family)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    cutoff = daily.agg(
        F.date_sub(F.max("day"), _PINBALL_HOLDOUT_DAYS).alias("cut")
    )
    base = daily.crossJoin(F.broadcast(cutoff))
    train = base.filter(F.col("day") <= F.col("cut")).select(
        (F.weekday("day") + F.lit(1)).alias("dow"), "y"
    )
    test = base.filter(F.col("day") > F.col("cut")).select(
        (F.weekday("day") + F.lit(1)).alias("dow"), "day", "y"
    )
    wd = Window.partitionBy("dow").orderBy("y")
    ranked = train.select(
        "dow",
        "y",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("dow")).alias("n"),
    )
    qcol = F.explode(F.array([F.lit(q) for q in _PINBALL_QS])).alias("q")
    fc = (
        ranked.select("dow", "y", "rn", "n", qcol)
        .filter(
            F.col("rn")
            == F.greatest(
                F.lit(1), F.ceil(F.col("q") * F.col("n")).cast("long")
            )
        )
        .select("dow", "q", F.col("y").alias("f"))
    )
    scored = test.join(F.broadcast(fc), "dow").select(
        "q",
        F.when(
            F.col("y") >= F.col("f"),
            F.col("q") * (F.col("y") - F.col("f")),
        )
        .otherwise((F.lit(1.0) - F.col("q")) * (F.col("f") - F.col("y")))
        .alias("loss"),
        F.when(F.col("y") <= F.col("f"), 1).otherwise(0).alias("covered"),
    )
    return scored.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        r6(F.avg("loss")).alias("mean_pinball"),
        r6(F.sum("covered").cast("double") / F.count(F.lit(1))).alias(
            "coverage"
        ),
    ).select(
        r6(F.col("q")).alias("quantile"), "n_test", "mean_pinball", "coverage"
    )


ml_pinball_loss.__doc__ = ml_pinball_loss.__doc__.format(
    h=_PINBALL_HOLDOUT_DAYS, qs=_PINBALL_QS
)
