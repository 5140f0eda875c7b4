"""Checkpoint-to-parquet materialization for reused subtrees.

Why not ``df.cache()``: a cached frame that feeds BOTH sides of a self-join
is cold while the first action builds, so each side computes the subtree
once anyway unless the cache is eagerly forced — and at 100 TB pinning
per-doc shingle sets / signatures in executor storage memory is a liability
(eviction under pressure silently reverts to full recompute, and the pinned
blocks compete with shuffle/execution memory).

Checkpointing to parquet instead (write once, read back) cuts the lineage,
costs one extra scan of a SMALL derived frame (one row per doc — orders of
magnitude smaller than the corpus), needs no unpersist bookkeeping, and
behaves identically on a 1000-executor cluster: the re-read is a plain
columnar scan, spillable and partition-pruned like any other source.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame


def checkpoint_parquet(df: DataFrame, label: str = "ckpt") -> DataFrame:
    """Write ``df`` to a session-scoped parquet path and read it back.

    The write is eager (it runs the subtree exactly once); the returned
    frame scans the files, so downstream self-joins and multi-consumer
    plans never recompute the lineage. Files live under the driver-local
    tmp dir keyed by Spark application id — on a real cluster point
    ``SPARK_GRAFT_CKPT_DIR`` at shared storage (HDFS/S3) instead.
    """
    spark = df.sparkSession
    base = os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/spark_graft_ckpt")
    path = os.path.join(
        base,
        spark.sparkContext.applicationId,
        f"{label}-{uuid.uuid4().hex[:8]}",
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
