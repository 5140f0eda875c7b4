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
