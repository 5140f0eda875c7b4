"""Versioned table emulation: snapshot isolation, MERGE history, and time
travel on plain parquet (S5 extension; the Delta/Iceberg story without a
table format).

Layout:

    table_path/
      v=0/  v=1/  ...        immutable snapshot directories
      _manifest.json          {"latest": N, "versions": [...]}

Writers never mutate an existing snapshot: every write (full or MERGE)
materializes a NEW ``v=N`` directory and then swaps the manifest — a single
small-file replace, which is the only non-atomic window (a real deployment
puts the manifest swap on an atomic rename or a transactional store; the
snapshot data itself is already crash-safe because half-written versions
are simply never referenced). Readers pin the manifest's ``latest`` (or any
historical version) and are isolated from concurrent writers — the
snapshot-isolation semantics ``upsert_overwrite`` cannot give.

At 100 TB: snapshots share nothing, so this trades storage for isolation —
use :func:`vacuum` to bound history, and partition-grain incremental
refresh (``sinks.upsert_partition_overwrite``) when storage dominates and
isolation doesn't matter.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_manifest.json")


def _read_manifest(table_path: str) -> dict:
    try:
        with open(_manifest_path(table_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"latest": None, "versions": []}


def _write_manifest(table_path: str, manifest: dict) -> None:
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_path))  # atomic on POSIX


def history(table_path: str) -> list[dict]:
    """Version log, oldest first: [{"version": N, "op": ...}, ...]."""
    return list(_read_manifest(table_path)["versions"])


def latest_version(table_path: str) -> int | None:
    return _read_manifest(table_path)["latest"]


def write_version(df: DataFrame, table_path: str, op: str = "overwrite") -> int:
    """Materialize ``df`` as the next immutable snapshot and point the
    manifest at it. Returns the new version number."""
    manifest = _read_manifest(table_path)
    version = (manifest["latest"] + 1) if manifest["latest"] is not None else 0
    df.write.mode("overwrite").parquet(os.path.join(table_path, f"v={version}"))
    manifest["versions"].append({"version": version, "op": op})
    manifest["latest"] = version
    _write_manifest(table_path, manifest)
    return version


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Time travel: read the latest snapshot, or any retained version."""
    manifest = _read_manifest(table_path)
    v = manifest["latest"] if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versions at {table_path}")
    retained = {e["version"] for e in manifest["versions"]}
    if v not in retained:
        raise FileNotFoundError(
            f"version {v} not retained at {table_path} (have {sorted(retained)})"
        )
    return spark.read.parquet(os.path.join(table_path, f"v={v}"))


def merge_version(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE (upsert by key) as a new snapshot: latest rows whose key is
    absent from ``updates`` + all update rows. History is preserved —
    ``read_version(path, n-1)`` still serves the pre-merge table."""
    manifest = _read_manifest(table_path)
    if manifest["latest"] is None:
        return write_version(updates, table_path, op="merge")
    current = read_version(spark, table_path)
    merged = current.join(updates, on=key_cols, how="left_anti").unionByName(updates)
    return write_version(merged, table_path, op="merge")


def vacuum(table_path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the last ``keep_last`` snapshots (storage bound).
    Returns the dropped version numbers. The manifest is rewritten first so
    a crash mid-delete leaves only unreferenced directories behind."""
    import shutil

    manifest = _read_manifest(table_path)
    versions = manifest["versions"]
    if len(versions) <= keep_last:
        return []
    dropped = [e["version"] for e in versions[:-keep_last]]
    manifest["versions"] = versions[-keep_last:]
    _write_manifest(table_path, manifest)
    for v in dropped:
        shutil.rmtree(os.path.join(table_path, f"v={v}"), ignore_errors=True)
    return dropped
