"""Restart-from-checkpoint pins (r13): a stateful streaming query stopped
mid-stream must, when restarted from its checkpointLocation, finish with a
sink table equal to the batch twin; and the foreachBatch delta-merge sink's
``_applied/batch=N`` marker must make a re-delivered micro-batch a no-op.

The heavyweight version — SIGKILLing the whole driver process at pre/post
sink-write kill points across five scenarios — lives in
``tools/stream_restart_check.py`` (r13 addendum records the matrix). This
pin keeps the in-process core honest: checkpoint recovery resumes exactly
where the stopped query left off, and the replay guard is load-bearing.
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def staged_src(spark, tmp_path_factory):
    """events fixture split into 4 ts-range files with ascending mtimes →
    4 deterministic micro-batches under maxFilesPerTrigger=1."""
    from move_forecast_ind_spark.sources import load_table

    d = str(tmp_path_factory.mktemp("stream_restart") / "src")
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(d)
    parts = sorted(
        f for f in os.listdir(d) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - 3600
    for i, f in enumerate(parts):
        os.utime(os.path.join(d, f), (base + i, base + i))
    return d


def _stream(spark, staged):
    from move_forecast_ind_spark.sources.tables import normalize_event_ts

    schema = spark.read.parquet(staged).schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(staged)
    )
    return normalize_event_ts(raw)


def test_restart_from_checkpoint_resumes_and_matches_batch(
    spark, staged_src, tmp_path
):
    from move_forecast_ind_spark.queries.streaming_q import st_tumbling_counts
    from move_forecast_ind_spark.streaming.events import tumbling_counts

    work = str(tmp_path / "work")
    os.makedirs(work)
    table = os.path.join(work, "table")
    seen: list[int] = []

    def make_sink(die_at: int | None):
        def sink(batch_df, bid):
            # die BEFORE the sink write and BEFORE the engine commit —
            # a deterministic mid-stream crash (a stop()-based version
            # raced the tiny fixture batches: all 4 could commit before
            # the stop landed, leaving nothing to resume)
            if die_at is not None and bid >= die_at:
                raise RuntimeError("injected mid-stream failure")
            batch_df.write.mode("overwrite").parquet(table)
            seen.append(bid)

        return sink

    def start(die_at=None):
        return (
            tumbling_counts(_stream(spark, staged_src))
            .writeStream.outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .foreachBatch(make_sink(die_at))
            .start()
        )

    # run 1: crash at micro-batch 2 of 4 (batches 0-1 committed)
    q = start(die_at=2)
    with pytest.raises(Exception):
        q.processAllAvailable()
        q.awaitTermination(120)
    q.stop()
    assert seen == [0, 1]

    # run 2: restart from the checkpoint; it must resume at the failed
    # batch (re-delivered — its offsets are logged, its commit is not),
    # not rewind to 0, and drain the remaining files
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert seen == [0, 1, 2, 3]

    out = spark.read.parquet(table)
    batch = st_tumbling_counts(spark, SF_SMALL)
    cols = ["bucket_s", "event_type", "n"]
    srows = sorted(tuple(r[c] for c in cols) for r in out.select(cols).collect())
    brows = sorted(tuple(r[c] for c in cols) for r in batch.select(cols).collect())
    assert srows == brows


def test_batch_id_marker_guard_dedupes_replayed_batch(spark, staged_src, tmp_path):
    from move_forecast_ind_spark.streaming.events import apply_count_delta

    table = str(tmp_path / "counts")
    parts = sorted(
        f
        for f in os.listdir(staged_src)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    for bid, f in enumerate(parts):
        apply_count_delta(
            spark.read.parquet(os.path.join(staged_src, f)), bid, table
        )
    total = spark.read.parquet(table).agg(F.sum("n")).first()[0]
    ev_total = spark.read.parquet(staged_src).count()
    assert total == ev_total

    victim = spark.read.parquet(os.path.join(staged_src, parts[1]))
    # guarded replay of batch 1: marker present -> no-op
    apply_count_delta(victim, 1, table)
    assert spark.read.parquet(table).agg(F.sum("n")).first()[0] == total

    # negative control: remove the marker and the same replay inflates,
    # proving the guard (not accidental idempotence) carries correctness
    shutil.rmtree(os.path.join(table, "_applied", "batch=1"))
    apply_count_delta(victim, 1, table)
    inflated = spark.read.parquet(table).agg(F.sum("n")).first()[0]
    assert inflated == total + victim.count()


def test_two_sequential_crashes_recover_reentrantly(spark, staged_src, tmp_path):
    """r14 (VERDICT item 4, unit-scale pin of the --two-kill protocol):
    recovery must be RE-ENTRANT — a second crash landing mid-drain of the
    first recovery still resumes exactly where it left off, never rewinds
    to batch 0 and never skips the twice-interrupted region. The
    process-level version (real SIGKILLs, sf0.1, 32 micro-batches) lives
    in ``tools/stream_restart_check.py --two-kill``; this pin keeps the
    in-process core honest in the suite."""
    from move_forecast_ind_spark.queries.streaming_q import st_tumbling_counts
    from move_forecast_ind_spark.streaming.events import tumbling_counts

    work = str(tmp_path / "work")
    os.makedirs(work)
    table = os.path.join(work, "table")
    seen: list[int] = []

    def make_sink(die_at: int | None):
        def sink(batch_df, bid):
            if die_at is not None and bid >= die_at:
                raise RuntimeError("injected mid-stream failure")
            batch_df.write.mode("overwrite").parquet(table)
            seen.append(bid)

        return sink

    def start(die_at=None):
        return (
            tumbling_counts(_stream(spark, staged_src))
            .writeStream.outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .foreachBatch(make_sink(die_at))
            .start()
        )

    # crash 1: batch 1 of 4 (only batch 0 committed)
    q = start(die_at=1)
    with pytest.raises(Exception):
        q.processAllAvailable()
        q.awaitTermination(120)
    q.stop()
    assert seen == [0]

    # recovery 1 is itself killed mid-drain: crash 2 at batch 3 — the
    # first recovery must have resumed at 1 (not 0) before dying
    q2 = start(die_at=3)
    with pytest.raises(Exception):
        q2.processAllAvailable()
        q2.awaitTermination(120)
    q2.stop()
    assert seen == [0, 1, 2]

    # recovery 2: drains the remainder; full delivery, no rewind, no gap
    q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert seen == [0, 1, 2, 3]

    out = spark.read.parquet(table)
    batch = st_tumbling_counts(spark, SF_SMALL)
    cols = ["bucket_s", "event_type", "n"]
    srows = sorted(tuple(r[c] for c in cols) for r in out.select(cols).collect())
    brows = sorted(tuple(r[c] for c in cols) for r in batch.select(cols).collect())
    assert srows == brows
