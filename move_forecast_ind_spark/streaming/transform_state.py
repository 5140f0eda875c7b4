"""Spark 4 ``transformWithStateInPandas`` operator (arbitrary stateful
processing v2): per-user ListState of the N most recent events.

This is the successor API to ``applyInPandasWithState`` (stateful.py):
instead of one opaque state tuple per key, a ``StatefulProcessor`` gets
typed, composable state primitives (ValueState / ListState / MapState),
timers, and TTL. The operator here keeps a bounded ListState — the last
``keep`` events per user in (ts, event_id) order — something the v1 API
can only fake by packing a list into a single value.

ENVIRONMENT GATE: the transformWithState Python runner talks to the JVM
state server over protobuf, and this container has no ``google.protobuf``
(and installs are disallowed). ``recent_events_state`` probes for it at
call time and raises a clear RuntimeError when absent —
tests/test_streaming.py asserts the gate fires cleanly, and the processor
logic itself is covered by a direct unit drive (no Spark needed for the
fold). Swapping environments with protobuf present enables the full
stream; the API call is already correct (verified against the pyspark
4.1.2 signature).

Batch twin semantics (same as w_row_number_topk_per_group's shape): the
last-3 rows per user by (ts, event_id), types comma-joined in time order.

Scale posture: state is O(keep) per user; each micro-batch shuffles only
its own rows; RocksDB state store (required by transformWithState) keeps
per-key state off-heap and incrementally checkpointed.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = "user_id long, n_recent int, recent_types string"
_ITEM_SCHEMA = StructType(
    [
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def fold_recent(
    items: list[tuple[int, int, str]],
    batch: pd.DataFrame,
    keep: int = 3,
) -> list[tuple[int, int, str]]:
    """Pure fold shared by the processor and its unit test: merge a
    micro-batch (columns ts[datetime64], event_id, event_type) into the
    bounded recent-items list, (us, event_id)-ordered, newest ``keep``."""
    items = list(items)
    if len(batch):
        items += list(
            zip(
                (batch["ts"].astype("int64") // 1000).tolist(),
                batch["event_id"].tolist(),
                batch["event_type"].tolist(),
            )
        )
    items.sort()
    return items[-keep:]


class RecentEventsProcessor(StatefulProcessor):
    """Keep the newest ``keep`` events per key in ListState; emit the
    refreshed (n_recent, comma-joined types) row each micro-batch."""

    def __init__(self, keep: int = 3):
        self._keep = keep

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState("recent", _ITEM_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        items = [
            (r["us"], r["event_id"], r["event_type"]) for r in self._recent.get()
        ]
        for pdf in rows:
            items = fold_recent(items, pdf, self._keep)
        self._recent.put([tuple(x) for x in items])
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_recent": [len(items)],
                "recent_types": [",".join(t for _, _, t in items)],
            }
        )

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """True when the protobuf runtime the TWS Python runner needs exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def recent_events_state(events: DataFrame, keep: int = 3) -> DataFrame:
    """Per-user most-recent-``keep`` events via transformWithStateInPandas.

    Raises RuntimeError with the capability gap when the environment lacks
    protobuf (see module docstring) instead of crashing mid-stream."""
    if not transform_with_state_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the google.protobuf package "
            "(the TWS Python runner's state-server protocol); it is not "
            "installed in this environment and installs are disallowed"
        )
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RecentEventsProcessor(keep),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
