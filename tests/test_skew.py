"""Salted join / aggregate equivalence: salting must not change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    from move_forecast_ind_spark.operators.skew import salted_join
    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    part = load_table(spark, SF_SMALL, "part").select("p_partkey", "p_brand")
    plain = li.join(
        part.withColumnRenamed("p_partkey", "l_partkey"), on=["l_partkey"]
    )
    salted = salted_join(
        li,
        part.withColumnRenamed("p_partkey", "l_partkey"),
        on=["l_partkey"],
        salt_source=F.col("l_orderkey") * 7 + F.col("l_linenumber"),
        n_salts=8,
    )
    cols = ["l_partkey", "l_orderkey", "l_linenumber", "l_quantity", "p_brand"]
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_salted_aggregate_matches_plain(spark):
    from move_forecast_ind_spark.operators.skew import salted_aggregate
    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        salt_source=F.col("l_orderkey"),
        aggs=[F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c")],
        merge_aggs=[F.sum("s").alias("s"), F.sum("c").alias("c")],
        n_salts=8,
    )
    p = {(r.l_returnflag): (r.s, r.c) for r in plain.collect()}
    s = {(r.l_returnflag): (r.s, r.c) for r in salted.collect()}
    assert set(p) == set(s)
    for k in p:
        assert abs(p[k][0] - s[k][0]) < 1e-6 and p[k][1] == s[k][1]


def test_detect_skew_flags_hot_key(spark):
    """A synthetic 90/10 skew: one key owning ~90% of rows must be flagged
    hot with a salt factor that spreads it back toward the mean load."""
    from pyspark.sql import functions as F

    from move_forecast_ind_spark.operators.skew import detect_skew

    hot = spark.range(0, 90_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(0, 10_000).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    report = detect_skew(
        hot.unionByName(cold), keys=["k"], sample_fraction=0.05, top_n=5
    ).collect()
    by_key = {r.k: r for r in report}
    assert "HOT" in by_key
    assert by_key["HOT"].is_hot
    assert by_key["HOT"].suggested_salts >= 8
    # cold keys near the mean must NOT be flagged
    assert all(not r.is_hot for r in report if r.k != "HOT")
    # estimates should recover the true magnitude within sampling noise
    assert 60_000 <= by_key["HOT"].est_rows <= 120_000
