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
