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
