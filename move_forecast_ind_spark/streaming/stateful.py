"""Custom stateful streaming operator (SURVEY.md §2.10 extension):
per-user event-gap tracking via ``applyInPandasWithState``.

The built-in windowed aggregates cannot express "largest gap between
CONSECUTIVE events per key across the whole stream" — consecutive-ness
needs the last-seen timestamp carried across micro-batches, which is
exactly what GroupState is for. State per user is three scalars
(count, last-seen ts, running max gap); output mode is ``update`` (one
refreshed row per touched user per micro-batch), so the memory/last-value
sink always holds the current answer.

Batch twin: ``queries/streaming_q.py::st_stateful_user_gaps`` — a lag
window over (ts, event_id), oracle-checked against DuckDB; the
stream-drain test asserts the drained state equals the batch twin row
for row.

Scale posture: state is keyed by user_id and O(1) per key; each
micro-batch shuffles only its own events to their key's partition. The
Arrow boundary moves one pandas frame per (user, batch) — no row-at-a-time
Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

OUTPUT_SCHEMA = (
    "user_id long, n_events long, max_gap_us long, last_seen_us long"
)
STATE_SCHEMA = "n long, last_us long, max_gap long"


def _update_user_gaps(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (sorted by ts, then event_id) into
    (count, last-seen-us, max-gap-us) state and emit the refreshed row."""
    n, last_us, max_gap = state.get() if state.exists else (0, None, 0)
    for pdf in pdfs:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        # datetime64[ns] int64 view // 1000 -> microseconds: deterministic
        # integer arithmetic, same unit as unix_micros()/epoch_us() in the
        # batch twin.
        for t in (pdf["ts"].astype("int64") // 1000).tolist():
            if last_us is not None and t - last_us > max_gap:
                max_gap = t - last_us
            last_us = t
            n += 1
    state.update((n, last_us, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_gap_us": [max_gap],
            "last_seen_us": [last_us],
        }
    )


def stateful_user_gaps(events: DataFrame) -> DataFrame:
    """Per-user cross-batch gap statistics: count, max gap between
    consecutive events (µs), last-seen timestamp (µs)."""
    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_gaps,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
