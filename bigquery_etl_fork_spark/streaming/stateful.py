"""Custom stateful streaming operator: per-key running CDC state.

The reference has no streaming stateful operators (SURVEY.md §2.10 — its
state lives in daily tables), but a change-log tailer benefits from one: a
per-key running aggregate (events seen, last LSN, live/deleted flag) kept in
Structured Streaming state via ``applyInPandasWithState`` — Arrow-batched,
update-mode output, the building block for streaming dedup/monitoring views
(e.g. the event_monitoring materialized-view analog with state).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id string, events_seen long, last_lsn long, is_deleted boolean"
STATE_SCHEMA = "events_seen long, last_lsn long, is_deleted boolean"


def running_key_state(stream: DataFrame, key: str = "doc_id") -> DataFrame:
    """Per-key running (events_seen, last_lsn, is_deleted) over a change
    stream; emits the updated state row for every key touched in a batch."""

    def update(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            events_seen, last_lsn, is_deleted = state.get
        else:
            events_seen, last_lsn, is_deleted = 0, -1, False
        for pdf in pdfs:
            events_seen += len(pdf)
            batch_max = int(pdf["lsn"].max())
            if batch_max > last_lsn:
                # winner of this batch decides liveness (LWW)
                win = pdf.loc[pdf["lsn"].idxmax()]
                is_deleted = win["op"] == "D"
                last_lsn = batch_max
        state.update((events_seen, last_lsn, is_deleted))
        yield pd.DataFrame(
            [
                {
                    "doc_id": key_tuple[0],
                    "events_seen": events_seen,
                    "last_lsn": last_lsn,
                    "is_deleted": is_deleted,
                }
            ]
        )

    return (
        stream.groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
