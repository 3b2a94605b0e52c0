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


def fold_key_batches(
    state_tuple: tuple[int, int, bool], pdfs: Iterable[pd.DataFrame]
) -> tuple[int, int, bool]:
    """Fold one key's micro-batch slices into (events_seen, last_lsn,
    is_deleted). At-least-once sources may re-deliver rows already folded
    into state; the LSN floor (only rows with lsn > last_lsn count) keeps
    events_seen — and the LWW liveness decision — exactly-once.

    All of the batch's chunks are concatenated BEFORE the floor is applied:
    applyInPandasWithState delivers one key's rows as multiple pandas
    chunks in arbitrary intra-batch order, so filtering chunk-by-chunk
    would drop a legitimately new low-LSN row that happened to arrive in a
    chunk after a higher-LSN one."""
    events_seen, last_lsn, is_deleted = state_tuple
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return events_seen, last_lsn, is_deleted
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    pdf = pdf[pdf["lsn"] > last_lsn]
    if not pdf.empty:
        events_seen += len(pdf)
        # winner of this batch decides liveness (LWW)
        win = pdf.loc[pdf["lsn"].idxmax()]
        is_deleted = bool(win["op"] == "D")
        last_lsn = int(win["lsn"])
    return events_seen, last_lsn, is_deleted


def running_key_state(stream: DataFrame, key: str = "doc_id") -> DataFrame:
    """Per-key running (events_seen, last_lsn, is_deleted) over a change
    stream; emits the updated state row for every key touched in a batch."""

    def update(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        prev = state.get if state.exists else (0, -1, False)
        events_seen, last_lsn, is_deleted = fold_key_batches(prev, pdfs)
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
