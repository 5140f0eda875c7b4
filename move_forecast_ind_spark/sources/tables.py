"""Parquet lake table sources.

The reference funnels every read through ad-hoc SQL into pandas
(reference main.py:56-66 ``fetch_data``, precompute_percentages.py:96-103,
pretrain_models.py:9). Here the lake is parquet read lazily by Spark, so
Catalyst pushes filters and column pruning into the scan for free — the
explicit SELECT lists and WHERE clauses the reference hand-writes become
optimizer work (SURVEY.md §4).

At 100 TB the same call works unchanged: parquet scans split by row-group,
partition-pruned if the lake is laid out as ``.../table/year=.../part-*.parquet``,
and `spark.sql.files.maxPartitionBytes` (default 128 MB) bounds per-task input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one lake table (filters/pruning push down).

    ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    it scans as epoch-nanos LONG and we normalize back to a microsecond
    TimestampType here so downstream plans see a plain timestamp column.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register lake tables as temp views for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
