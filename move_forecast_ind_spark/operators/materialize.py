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
import warnings

from pyspark.sql import DataFrame


def materialize(
    df: DataFrame,
    label: str = "ckpt",
    mode: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut ``df``'s lineage so multi-consumer plans compute it once.

    mode (default from ``SPARK_GRAFT_MATERIALIZE``, else TOPOLOGY-AWARE:
    ``local`` on a ``local[N]`` master, ``parquet`` on anything
    multi-executor — see :func:`_default_mode`):

    - ``local`` — ``localCheckpoint(eager=True)``: blocks in the executor
      block manager (MEMORY_AND_DISK), no parquet encode/commit round-trip.
      Round-3 measurement at sf0.1: saves 0.3-0.5 s per materialization vs
      the parquet path (the parquet write's fixed job+commit cost dominates
      at small-derived-frame sizes). Caveats at cluster scale: blocks are
      NOT fault-tolerant (a lost executor fails the job rather than
      recomputing — r12 ``tools/fault_check.py`` demonstrates the failure
      with a real SIGKILL) and they occupy storage memory — the
      latency-bound single-JVM bench/serving path.
    - ``parquet`` — :func:`checkpoint_parquet`: durable, spillable,
      partition-prunable; the 100 TB batch default (point
      ``SPARK_GRAFT_CKPT_DIR`` at shared storage). Survives executor
      loss: the re-read recomputes only the lost partitions' consumers
      (fault_check: hash-exact through a mid-query executor SIGKILL).
    - ``none`` — no materialization (every consumer recomputes the
      subtree; only sane when the subtree is a pruned scan).

    ``eager=False`` (r14, local mode only): mark for localCheckpoint but
    let the CALLER's next action materialize it — for loops that follow
    every checkpoint with a scalar probe (connected_components' changed
    count), this folds the checkpoint job and the probe job into one.
    The parquet path is inherently eager (the write IS the
    materialization); ``eager`` is ignored there.
    """
    explicit = mode or os.environ.get("SPARK_GRAFT_MATERIALIZE")
    mode = explicit or _default_mode(df)
    if mode == "parquet" and not explicit and _parquet_ckpt_unsafe(df):
        # Topology picked parquet but the checkpoint base would be
        # node-local /tmp on a genuinely multi-node cluster whose default
        # filesystem is file:// — executor task outputs would land on each
        # node's OWN /tmp and the driver read-back would see partial/no
        # files, i.e. silently wrong results. Fall back to localCheckpoint
        # (correct, merely not fault-tolerant) and tell the operator how
        # to get durability back: set SPARK_GRAFT_CKPT_DIR to shared
        # storage (HDFS/S3/NFS). Explicit mode/env requests are honored
        # as given — the guard only overrides the silent default.
        warnings.warn(
            "materialize(): multi-node master with a file:// default "
            "filesystem and no SPARK_GRAFT_CKPT_DIR — a node-local "
            "parquet checkpoint would be unreadable from the driver; "
            "falling back to localCheckpoint (NOT fault-tolerant). Set "
            "SPARK_GRAFT_CKPT_DIR to shared storage for the durable path.",
            stacklevel=2,
        )
        mode = "local"
    if mode == "none":
        return df
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "parquet":
        # a handful of files keeps re-scan task counts sane for small frames
        return checkpoint_parquet(df, label, npartitions=8)
    raise ValueError(f"unknown materialize mode {mode!r}")


def _default_mode(df: DataFrame) -> str:
    """Topology-aware default (r12): ``local`` only when the master is a
    single-JVM ``local[N]`` — there executor loss means process death and
    localCheckpoint's speed is free — otherwise ``parquet``, so any REAL
    multi-executor deployment (local-cluster, standalone, YARN, k8s) is
    fault-tolerant BY DEFAULT rather than by remembering an env var.
    ``SPARK_GRAFT_MATERIALIZE`` still overrides both ways (e.g. ``local``
    to bench a healthy cluster's fast path)."""
    try:
        master = df.sparkSession.sparkContext.master
    except Exception:  # pragma: no cover - Connect sessions lack a SC
        return "parquet"
    # bare "local" (one thread, no brackets) is as single-JVM as local[N]
    return (
        "local"
        if master == "local" or master.startswith("local[")
        else "parquet"
    )


def _parquet_ckpt_unsafe(df: DataFrame) -> bool:
    """True when the DEFAULT parquet checkpoint base (node-local /tmp)
    cannot round-trip: no ``SPARK_GRAFT_CKPT_DIR``, a default filesystem
    of ``file://``, and a master that can place executors on OTHER hosts
    (standalone/YARN/k8s/mesos). ``local-cluster[...]`` is multi-executor
    but single-host, so its node-local /tmp IS shared — safe."""
    if os.environ.get("SPARK_GRAFT_CKPT_DIR"):
        return False
    try:
        sc = df.sparkSession.sparkContext
        master = sc.master
        if (
            master == "local"
            or master.startswith("local[")
            or master.startswith("local-cluster[")
        ):
            return False
        default_fs = sc._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///"
        )
    except Exception:  # pragma: no cover - Connect sessions lack a SC
        return False
    return default_fs.startswith("file:")


def checkpoint_parquet(
    df: DataFrame, label: str = "ckpt", npartitions: int | None = None
) -> DataFrame:
    """Write ``df`` to a session-scoped parquet path and read it back.

    The write is eager (it runs the subtree exactly once); the returned
    frame scans the files, so downstream self-joins and multi-consumer
    plans never recompute the lineage. Files live under the driver-local
    tmp dir keyed by Spark application id — on a real cluster point
    ``SPARK_GRAFT_CKPT_DIR`` at shared storage (HDFS/S3) instead.

    ``npartitions`` coalesces the write: a checkpoint of a small derived
    frame (per-doc sets, a pre-aggregated table) otherwise lands as one
    near-empty file per shuffle partition, and every downstream re-scan
    pays a per-file open — at 32 local partitions that costs more than the
    data. Size it so files land in the 16–128 MB band at the target scale
    (callers at 100 TB pass a proportionally larger value or None).
    """
    spark = df.sparkSession
    base = os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/spark_graft_ckpt")
    path = os.path.join(
        base,
        spark.sparkContext.applicationId,
        f"{label}-{uuid.uuid4().hex[:8]}",
    )
    if npartitions is not None:
        df = df.coalesce(npartitions)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
