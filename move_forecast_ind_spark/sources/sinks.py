"""Sinks and table management (SURVEY.md §2.1 S5-S9).

The reference's sinks are psycopg2 batched upserts with ON CONFLICT, manual
DDL + information_schema existence checks, and secondary indexes
(reference precompute_percentages.py:36-79, 218-255). Spark-first:

- **Upsert (S5)** → the derived table is a pure function of its inputs, so
  mode("overwrite") IS the upsert; for *incremental* upserts without Delta,
  :func:`upsert_overwrite` implements the anti-join + union pattern (the
  MERGE emulation) atomically via a staging write.
- **DDL / existence (S8)** → ``spark.catalog`` API + ``CREATE TABLE ...
  USING parquet``.
- **Indexes (S9)** → no indexes in Spark; :func:`write_partitioned` lays the
  table out partitioned by the filter key (partition pruning ≈ the index),
  and :func:`write_bucketed` buckets by the join key so later joins on it
  skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, *part_cols: str) -> None:
    """Partition-pruned layout: one directory level per key (the analog of
    the reference's (Branch, Date) index — queries filtering those keys
    read only matching directories)."""
    df.write.mode("overwrite").partitionBy(*part_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, *bucket_cols: str
) -> None:
    """Bucketed managed table: co-locates rows by join key at write time;
    joins/aggregations on the bucket key then plan without an Exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def upsert_overwrite(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE-emulation for plain parquet: keep target rows whose key is NOT
    in updates (left_anti), union the updates, overwrite. Matches the
    reference's ON CONFLICT DO UPDATE semantics (last write wins per key).

    Not snapshot-isolated like Delta MERGE. The staging write ensures the
    merge plan fully materializes before the target is touched (a failure
    while COMPUTING the merge can't corrupt the target); the final
    stage→target copy is itself a rewrite, so a crash inside it still needs
    the stage directory for recovery — true atomic swap requires an
    FS-level rename or a table format.
    """
    from pyspark.errors import AnalysisException

    try:
        target = spark.read.parquet(target_path)
    except AnalysisException as e:
        # ONLY the missing-target case means "first write" — any other read
        # failure (corrupt footer, transient FS error) must abort, or the
        # overwrite below would silently drop every non-updated key.
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        merged = updates
    else:
        merged = target.join(updates, on=key_cols, how="left_anti").unionByName(
            updates
        )
    stage = target_path.rstrip("/") + "__stage"
    merged.write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite").parquet(target_path)


def upsert_partition_overwrite(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    partition_cols: list[str],
) -> None:
    """Incremental upsert at PARTITION grain — the ``replaceWhere`` pattern
    without Delta: rewrite only the partitions present in ``updates``
    (Spark dynamic partition overwrite), leaving every other partition's
    files untouched.

    This matches the reference's incremental upsert semantics
    (precompute_percentages.py:218-233 ON CONFLICT DO UPDATE, resumed
    mid-keyspace by checkpoint): re-deriving one branch's rows replaces
    exactly that branch's partition. Contract: ``updates`` must carry the
    COMPLETE new contents of each touched partition (derived tables
    recomputed per-partition satisfy this by construction — each partition
    is a pure function of its slice of the input).

    At 100 TB this is the difference between rewriting ~1/110th of the
    table per incremental branch refresh and rewriting all of it; the
    key-level anti-join MERGE (:func:`upsert_overwrite`) stays the tool
    for sub-partition updates.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            target_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def table_exists(spark: SparkSession, name: str) -> bool:
    """S8's information_schema probe, catalog-native."""
    return spark.catalog.tableExists(name)


def ensure_table(spark: SparkSession, name: str, path: str, schema_ddl: str) -> None:
    """CREATE TABLE IF NOT EXISTS ... USING parquet LOCATION ..."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema_ddl}) USING parquet "
        f"LOCATION '{path}'"
    )


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
