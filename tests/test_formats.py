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


def test_read_evolving_merges_added_column(spark, tmp_path):
    """r13 schema evolution: a table directory whose newer files carry an
    added column reads as the union schema (old files NULL-filled), and a
    target-schema read conforms both generations to one stable schema."""
    from pyspark.sql import types as T

    from move_forecast_ind_spark.sources.formats import (
        conform_schema,
        read_evolving,
    )

    d = str(tmp_path / "tbl")
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    old.write.parquet(d + "/gen=0")
    new = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.7)], ["id", "name", "score"]
    )
    new.write.parquet(d + "/gen=1")

    # union read: added column present, NULL for the old generation
    merged = read_evolving(spark, d)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[3] == 0.5

    # target-schema read: stable projection regardless of generation,
    # including a column NO file has yet (forward-compat consumer)
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    conformed = read_evolving(spark, d, target)
    assert [f.name for f in conformed.schema.fields] == ["id", "score", "lang"]
    assert conformed.filter("lang IS NOT NULL").count() == 0
    assert conformed.filter("score IS NOT NULL").count() == 2

    # conform_schema drops extras and casts in place
    slim = conform_schema(new, T.StructType([T.StructField("id", T.StringType())]))
    assert slim.columns == ["id"] and slim.schema["id"].dataType.simpleString() == "string"


def test_read_evolving_widening_types(spark, tmp_path):
    """Widening evolution (int→long, float→double) reads cleanly under one
    declared target schema — the parquet vectorized reader upcasts per
    file, so producers can widen without a table rewrite."""
    from pyspark.sql import types as T

    from move_forecast_ind_spark.sources.formats import read_evolving

    d = str(tmp_path / "tblw")
    spark.createDataFrame([(1,)], ["v"]).selectExpr("CAST(v AS INT) AS v").write.parquet(
        d + "/gen=0"
    )
    spark.createDataFrame([(2,)], ["v"]).selectExpr("CAST(v AS BIGINT) AS v").write.parquet(
        d + "/gen=1"
    )
    target = T.StructType([T.StructField("v", T.LongType())])
    out = read_evolving(spark, d, target)
    assert out.schema["v"].dataType.simpleString() == "bigint"
    assert sorted(r["v"] for r in out.collect()) == [1, 2]


def test_read_tolerant_corrupt_file_posture(spark, tmp_path):
    """r13: a garbage file in a table directory fails the default read
    loudly; the per-read ignoreCorruptFiles opt-in returns the valid
    files' rows — both postures pinned so neither silently flips."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from move_forecast_ind_spark.sources.formats import read_tolerant

    d = str(tmp_path / "tblc")
    spark.createDataFrame([(1,), (2,)], ["v"]).write.parquet(d)
    with open(d + "/part-corrupt.parquet", "wb") as fh:
        fh.write(b"PAR1 this is not a parquet file")
    schema = T.StructType([T.StructField("v", T.LongType())])

    with _pytest.raises(Exception):
        read_tolerant(spark, d, schema).collect()  # loud by default

    ok = read_tolerant(spark, d, schema, ignore_corrupt=True)
    assert sorted(r["v"] for r in ok.collect()) == [1, 2]
