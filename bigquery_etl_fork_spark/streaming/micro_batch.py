"""Change-log tailing: micro-batch driver loop + Structured Streaming sugar.

The reference is micro-batch (Airflow-scheduled daily/hourly runs,
``dags.yaml``; its only push-style machinery is a 60-min-refresh
materialized view, ``sql_generators/glean_usage/templates/
event_monitoring_live_v1.materialized_view.sql:1-7``). SURVEY.md §2.10 maps
this to epoch replay over an ordered log; Structured Streaming is optional
sugar on the same apply path:

- ``tail_changelog``  — the production tailer: poll the log directory for
  epoch partitions above the committed watermark, apply them in order
  through ``CDCEngine`` (exactly-once via epoch fencing). Late/duplicate
  events are handled by LWW, not by watermarks — ordering is restored by
  (key, lsn), matching the reference's re-run/overwrite model.
- ``stream_changelog`` — Structured Streaming file source +
  ``foreachBatch``: each micro-batch is split into its epochs and applied
  in order. Safe under Structured Streaming's at-least-once ``foreachBatch``
  semantics because the engine's epoch fencing makes re-application a no-op.
"""

from __future__ import annotations

import os
import re
import time

from pyspark.sql import DataFrame

from ..engine.cdc import WATERMARK_PROP, CDCEngine, ReplayStats

_EPOCH_DIR = re.compile(r"^epoch=(\d+)$")


def discover_epochs(log_dir: str, complete_marker: str | None = None) -> list[int]:
    """Epoch partition ids present on disk (hive-style ``epoch=N`` dirs).

    ``complete_marker``: only report epochs whose directory contains the
    marker file (e.g. ``_SUCCESS``) — the epoch-complete convention for
    producers that write an epoch directory non-atomically. Without a
    marker, a tailer that reads an epoch mid-write would fence it at the
    watermark and skip the remainder forever."""
    out = []
    for entry in os.listdir(log_dir):
        m = _EPOCH_DIR.match(entry)
        if not m:
            continue
        if complete_marker is not None and not os.path.exists(
            os.path.join(log_dir, entry, complete_marker)
        ):
            continue
        out.append(int(m.group(1)))
    return sorted(out)


def ready_epochs(log_dir: str, complete_marker: str | None = None) -> list[int]:
    """Epochs safe to apply NOW, in order: the prefix of on-disk epochs up
    to (and excluding) the first one still missing its ``complete_marker``
    — or the first HOLE in the epoch numbering, which is an epoch whose
    directory a (parallel) producer hasn't even created yet. Stopping at
    either gap matters: the engine fences with a single watermark, so
    applying epoch N+1 while epoch N is mid-write (or not yet on disk)
    would advance the watermark past N and silently drop it once it lands.
    Corollary of marker mode: epoch ids must be dense — a deliberately
    skipped id would stall the tailer (loudly detectable) rather than lose
    data (silent). Without a marker the producer is declaring directory
    creation atomic, and every on-disk epoch is ready."""
    if complete_marker is None:
        return discover_epochs(log_dir)
    out = []
    prev = None
    for e in discover_epochs(log_dir):
        if prev is not None and e != prev + 1:
            break  # numbering hole: epoch prev+1 not created yet
        if not os.path.exists(
            os.path.join(log_dir, f"epoch={e}", complete_marker)
        ):
            break
        out.append(e)
        prev = e
    return out


def tail_changelog(
    engine: CDCEngine,
    log_dir: str,
    poll_interval_s: float = 5.0,
    max_polls: int | None = None,
    stop_at_epoch: int | None = None,
    complete_marker: str | None = None,
    post_apply=None,
) -> ReplayStats:
    """Tail a growing change-log directory: apply any epoch above the
    committed watermark, in order; poll for new ones. Returns when
    ``stop_at_epoch`` is reached or ``max_polls`` polls found nothing new
    (None = tail forever). Pass ``complete_marker`` (e.g. ``"_SUCCESS"``)
    when the producer writes epoch directories non-atomically, so an epoch
    is only applied — and fenced — once its marker says it's complete.
    ``post_apply`` (fn(EpochStats) -> None) runs after each epoch commits —
    the hook for downstream incremental derivations (e.g.
    ``IncrementalRollup.refresh``, whose own version fence makes a crashed
    or re-run hook harmless), so materialized views track the live table
    epoch-by-epoch instead of by scheduled rescan."""
    spark = engine.spark
    stats = ReplayStats()
    idle_polls = 0
    while True:
        watermark = engine.table.snapshot.properties.get(WATERMARK_PROP, -1)
        pending = [e for e in ready_epochs(log_dir, complete_marker) if e > watermark]
        if pending:
            idle_polls = 0
            for e in pending:
                df = spark.read.parquet(os.path.join(log_dir, f"epoch={e}"))
                st = engine.apply_epoch(e, df)
                stats.epochs.append(st)
                if post_apply is not None:
                    post_apply(st)
                if stop_at_epoch is not None and e >= stop_at_epoch:
                    return stats
        else:
            idle_polls += 1
            if max_polls is not None and idle_polls >= max_polls:
                return stats
            time.sleep(poll_interval_s)


def stream_changelog(
    engine: CDCEngine,
    log_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    complete_marker: str | None = None,
    max_files_per_trigger: int | None = None,
    post_apply=None,
):
    """Structured Streaming variant: file-source ``readStream`` over the log
    directory, ``foreachBatch`` applying each contained epoch in order.
    Returns the StreamingQuery (caller awaits termination).

    Exactly-once shape: the micro-batch's rows are used only as a TRIGGER —
    each batch re-lists the log directory (``ready_epochs``) and applies, in
    order, every complete epoch above the watermark by reading its FULL
    ``epoch=N`` directory, then fencing it. Re-listing (rather than trusting
    the batch's own rows) matters twice over: (a) Spark's file source never
    re-delivers already-processed files, so an epoch whose data files all
    arrived before its ``complete_marker`` landed would otherwise never be
    re-signaled — a later batch for ANY epoch now picks it up; (b)
    ``ready_epochs`` stops at the first unmarked epoch, so a higher epoch's
    apply can never advance the single watermark past a still-writing lower
    epoch and silently drop it. Split-epoch delivery (``maxFilesPerTrigger``)
    stays correct: the first triggering batch applies the whole directory
    and later batches carrying the remaining files find it fenced."""
    spark = engine.spark
    schema = spark.read.parquet(log_dir).schema

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        watermark = engine.table.snapshot.properties.get(WATERMARK_PROP, -1)
        for e in ready_epochs(log_dir, complete_marker):
            if e <= watermark:
                continue  # idempotent re-delivery of an applied epoch
            # apply the complete on-disk epoch, NOT the batch slice
            epoch_dir = os.path.join(log_dir, f"epoch={e}")
            st = engine.apply_epoch(e, spark.read.parquet(epoch_dir))
            if post_apply is not None:
                post_apply(st)

    builder = spark.readStream.schema(schema).option("basePath", log_dir)
    if max_files_per_trigger is not None:
        builder = builder.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = builder.parquet(log_dir + "/epoch=*")
    writer = reader.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
