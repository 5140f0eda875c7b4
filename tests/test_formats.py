"""Format round-trip tests: parquet/ORC/JSON/CSV writes re-read with explicit
schemas must reproduce the source rows (timestamps via ISO strings for the
text formats)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, fmt):
    from move_forecast_ind_spark.sources import load_table
    from move_forecast_ind_spark.sources.formats import read_as, write_as

    src = (
        load_table(spark, SF_SMALL, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate_s"),
        )
        .limit(500)
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"orders_{fmt}")
        write_as(src, path, fmt)
        back = read_as(spark, path, fmt, src.schema)
        assert back.schema == src.schema
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_unknown_format_rejected(spark):
    from move_forecast_ind_spark.sources import load_table
    from move_forecast_ind_spark.sources.formats import write_as

    with pytest.raises(ValueError):
        write_as(load_table(spark, SF_SMALL, "region"), "/tmp/x", "avro")


def test_jdbc_roundtrip_and_pushdown(spark):
    """EXECUTED JDBC connectivity via embedded Derby (ships in Spark's
    jars/): write a lake table out over JDBC, read it back, and verify
    (a) the data round-trips exactly and (b) filters are PUSHED into the
    database scan (starred pushed-filter markers in the plan)."""
    import tempfile

    from move_forecast_ind_spark.sources import load_table
    from move_forecast_ind_spark.sources.formats import (
        derby_url,
        jdbc_table,
        jdbc_write,
    )

    url = derby_url(tempfile.mkdtemp(prefix="derby_t_") + "/db")
    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    jdbc_write(nation, url, "nation")
    back = jdbc_table(spark, url, "nation")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    flt = back.filter("n_regionkey = 1").select("n_name")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [*IsNotNull(n_regionkey), *EqualTo(n_regionkey,1)]" in plan
    assert flt.count() == nation.filter("n_regionkey = 1").count()
