"""Lake-layout tests: partition pruning, dynamic partition pruning, and
observation metrics (the executable half of SCALE.md's claims)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def year_partitioned_lineitem(spark):
    from move_forecast_ind_spark.sources import load_table

    d = tempfile.mkdtemp(prefix="mfis_lake_")
    li = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.mode("overwrite").partitionBy("ship_year").parquet(d)
    yield d


def _plan(df) -> str:
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "10000")
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, year_partitioned_lineitem):
    df = spark.read.parquet(year_partitioned_lineitem).filter(
        F.col("ship_year") == 1997
    )
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(ship_year" in plan
    years = {r.y for r in df.select(F.year("l_shipdate").alias("y")).distinct().collect()}
    assert years == {1997}


def test_dynamic_partition_pruning(spark, year_partitioned_lineitem):
    """A join against a filtered dim should prune fact partitions at
    runtime (DPP): the fact scan's PartitionFilters carries a
    dynamicpruning expression."""
    fact = spark.read.parquet(year_partitioned_lineitem)
    dim = (
        spark.range(1995, 2002)
        .select(F.col("id").cast("int").alias("ship_year"))
        .filter(F.col("ship_year").isin(1996, 1997))
    )
    joined = fact.join(dim, on="ship_year").groupBy("ship_year").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower()
    got = {r.ship_year for r in joined.collect()}
    assert got == {1996, 1997}


def test_events_ts_is_timestamp_every_sf(spark):
    """Loader contract: events.ts is plain TimestampType regardless of the
    physical parquet encoding (TIMESTAMP(NANOS)→long, timestamp[us]→NTZ, or
    native TIMESTAMP). Round-3 regression: the testdata re-encoded to
    timestamp[us] (Spark reads TIMESTAMP_NTZ) and every unix_micros()
    downstream threw DATATYPE_MISMATCH."""
    from pyspark.sql import types as T

    from move_forecast_ind_spark.sources import load_table

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        ev = load_table(spark, d, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType), sf
        # unix_micros must resolve — this is what round 3 broke.
        ev.select(F.unix_micros("ts").alias("us")).limit(1).collect()


def test_normalize_event_ts_all_encodings(spark):
    """normalize_event_ts maps each physical encoding to the same epoch
    micros under the UTC session tz."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from move_forecast_ind_spark.sources.tables import normalize_event_ts

    epoch_us = 1_700_000_123_456_789
    # nanos-as-long encoding
    df_long = spark.createDataFrame(
        [Row(ts=epoch_us * 1000)], T.StructType([T.StructField("ts", T.LongType())])
    )
    # NTZ encoding (wall-clock equal to the UTC instant)
    import datetime

    naive = datetime.datetime.utcfromtimestamp(epoch_us / 1_000_000)
    df_ntz = spark.createDataFrame(
        [Row(ts=naive)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    for df in (df_long, df_ntz):
        out = normalize_event_ts(df)
        assert isinstance(out.schema["ts"].dataType, T.TimestampType)
        got = out.select(F.unix_micros("ts").alias("us")).collect()[0].us
        assert got == epoch_us, (df.schema, got)
    # already-TIMESTAMP passes through untouched
    ts_df = normalize_event_ts(df_ntz)
    assert normalize_event_ts(ts_df) is ts_df


def test_observation_metrics(spark):
    """Observation API: data-quality counters piggyback on the main action
    instead of extra scans (the reference's P10 null probes cost a second
    full pass)."""
    from pyspark.sql import Observation

    from move_forecast_ind_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("n_null_qty"),
        F.max("l_shipdate").alias("max_ship"),
    )
    n = observed.filter(F.col("l_quantity") > 0).count()
    got = obs.get
    assert got["n_rows"] >= n
    assert got["n_null_qty"] == 0
    assert got["max_ship"] is not None
