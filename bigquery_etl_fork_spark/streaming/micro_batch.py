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

from pyspark.sql import DataFrame, functions as F

from ..engine.cdc import WATERMARK_PROP, CDCEngine, ReplayStats

_EPOCH_DIR = re.compile(r"^epoch=(\d+)$")


def discover_epochs(log_dir: str) -> list[int]:
    """Epoch partition ids present on disk (hive-style ``epoch=N`` dirs)."""
    out = []
    for entry in os.listdir(log_dir):
        m = _EPOCH_DIR.match(entry)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def tail_changelog(
    engine: CDCEngine,
    log_dir: str,
    poll_interval_s: float = 5.0,
    max_polls: int | None = None,
    stop_at_epoch: int | None = None,
) -> ReplayStats:
    """Tail a growing change-log directory: apply any epoch above the
    committed watermark, in order; poll for new ones. Returns when
    ``stop_at_epoch`` is reached or ``max_polls`` polls found nothing new
    (None = tail forever)."""
    spark = engine.spark
    stats = ReplayStats()
    idle_polls = 0
    while True:
        watermark = engine.table.snapshot.properties.get(WATERMARK_PROP, -1)
        pending = [e for e in discover_epochs(log_dir) if e > watermark]
        if pending:
            idle_polls = 0
            for e in pending:
                df = spark.read.parquet(os.path.join(log_dir, f"epoch={e}"))
                stats.epochs.append(engine.apply_epoch(e, df))
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
):
    """Structured Streaming variant: file-source ``readStream`` over the log
    directory, ``foreachBatch`` applying each contained epoch in order.
    Returns the StreamingQuery (caller awaits termination)."""
    spark = engine.spark
    schema = spark.read.parquet(log_dir).schema

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        epochs = [
            r[0]
            for r in batch.select(engine.epoch_col).distinct().orderBy(engine.epoch_col).collect()
        ]
        watermark = engine.table.snapshot.properties.get(WATERMARK_PROP, -1)
        for e in epochs:
            if e <= watermark:
                continue  # idempotent re-delivery of an applied epoch
            engine.apply_epoch(e, batch.where(F.col(engine.epoch_col) == F.lit(e)))

    reader = (
        spark.readStream.schema(schema)
        .option("basePath", log_dir)
        .parquet(log_dir + "/epoch=*")
    )
    writer = reader.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
