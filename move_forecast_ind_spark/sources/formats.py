"""Multi-format sources/sinks (SURVEY.md §2.1 S1 generalized).

The reference reads exactly one format (Postgres via SQL strings). A lake
engine needs parquet (default), ORC, CSV, and JSON lines — each with an
EXPLICIT schema on read: schema inference is a full extra pass over the
data and type-unstable between files; at 100 TB it is banned
(`infer_schema=False` is not even exposed here).

JDBC (the reference's actual source) is a config away —
``spark.read.format("jdbc").option("query", ...)`` with pushdown — but no
database exists in this environment; gated behind :func:`jdbc_scan`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "json", "csv")


def write_as(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    getattr(w, fmt)(path)


def read_as(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Schema-explicit read for any supported format (no inference pass)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return getattr(r, fmt)(path)


def jdbc_scan(
    spark: SparkSession, url: str, query: str, **options: str
) -> DataFrame:
    """S1: the reference's ``fetch_data(query)`` as a JDBC pushdown scan.
    Requires a JDBC driver jar on the classpath — not present in this
    environment, so this raises unless one is installed."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
