"""Epoch-fenced CDC replay: ordered change log → lake table upserts.

The engine's control loop — the from-scratch replacement for the reference's
scheduled daily pipeline. Correspondences:

- strictly ordered epochs with ``depends_on_past`` semantics — reference
  Airflow serialization of incremental tables
  (``bigquery_etl/query_scheduling/task.py:328-337``); here: epoch N applies
  only after epoch N-1's snapshot committed.
- idempotent epoch application / resume — reference shredder ``wait_for_job``
  resuming from its state table instead of re-running
  (``bigquery_etl/shredder/delete.py:193-243``); here: the epoch watermark is
  a snapshot property committed atomically with the data, so a crash anywhere
  leaves either "epoch fully applied" or "epoch not applied"; replay skips
  committed epochs.
- per-partition lineage — reference task accounting (target_rows,
  target_bytes, ``delete.py:810-827``); here: one manifest row per affected
  bucket per epoch (FIXTURES.md §4 schema), stored inside the snapshot.
- LWW dedup + MERGE apply — ``copy_deduplicate.py:57-81`` + MERGE scripts;
  here: ``operators.dedup_lww`` + ``operators.merge``.
- schema evolution mid-stream — ``ALLOW_FIELD_ADDITION``/``RELAXATION``
  (``cli/query.py:1219-1236``) + ``Schema.merge``; here: additive/widening
  changes detected per epoch, applied as a metadata-only snapshot commit,
  data coerced by Arrow-vectorized ``compat_select``.

Scale shape per epoch (E events into a table of B buckets):
  scan epoch slice (partition-pruned) → LWW reduce (map-side combine, one
  shuffle on hash(doc_id)) → affected-bucket set (≤B, driver-side) → scan
  ONLY affected buckets of state → broadcast-anti join (state side never
  shuffles) → one bucket-clustering shuffle of merged output → atomic commit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lake import BUCKET_COL, LakeTable, bucket_id
from ..operators.dedup_lww import lww_dedup, lww_dedup_salted
from ..operators.merge import OP_DELETE, merge_delta
from ..operators.skew import is_skewed
from ..schema_evolution import compat_select, is_write_compatible, merge_schemas

RESERVED_COLS = ("lsn", "epoch", "op", "event_ts")
WATERMARK_PROP = "epoch_watermark"


class SimulatedCrash(RuntimeError):
    """Raised by tests to model a crash between epochs."""


@dataclass
class EpochStats:
    epoch: int
    events_in: int
    rows_upserted: int
    rows_deleted: int
    buckets_touched: int
    latency_s: float
    skipped: bool = False


@dataclass
class ReplayStats:
    epochs: list[EpochStats] = field(default_factory=list)

    @property
    def total_events(self) -> int:
        return sum(e.events_in for e in self.epochs if not e.skipped)

    @property
    def total_seconds(self) -> float:
        return sum(e.latency_s for e in self.epochs if not e.skipped)

    @property
    def events_per_sec(self) -> float:
        return self.total_events / self.total_seconds if self.total_seconds else 0.0


class CDCEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        key: str = "doc_id",
        order: str = "lsn",
        op_col: str = "op",
        epoch_col: str = "epoch",
        dedup_mode: str = "jvm",
        salt: str = "auto",
        salt_n: int = 16,
        hot_threshold: int = 100_000,
        count_input: bool = True,
    ):
        self.spark = spark
        self.table = table
        self.key = key
        self.order = order
        self.op_col = op_col
        self.epoch_col = epoch_col
        self.dedup_mode = dedup_mode
        self.salt = salt
        self.salt_n = salt_n
        self.hot_threshold = hot_threshold
        self.count_input = count_input

    # ---------------- public API ----------------

    def replay(
        self,
        log: DataFrame | Iterable[tuple[int, DataFrame]],
        fail_after_epoch: int | None = None,
    ) -> ReplayStats:
        """Apply every epoch of the change log in order, skipping epochs at or
        below the committed watermark (crash-safe resume)."""
        if isinstance(log, DataFrame):
            epochs = [
                r[0]
                for r in log.select(self.epoch_col).distinct().orderBy(self.epoch_col).collect()
            ]
            batches: Iterable[tuple[int, DataFrame]] = (
                (e, log.where(F.col(self.epoch_col) == F.lit(e))) for e in epochs
            )
        else:
            batches = log

        stats = ReplayStats()
        for epoch, events in batches:
            watermark = self.table.snapshot.properties.get(WATERMARK_PROP, -1)
            if epoch <= watermark:
                stats.epochs.append(EpochStats(epoch, 0, 0, 0, 0, 0.0, skipped=True))
                continue
            stats.epochs.append(self.apply_epoch(epoch, events))
            if fail_after_epoch is not None and epoch >= fail_after_epoch:
                raise SimulatedCrash(f"simulated crash after committing epoch {epoch}")
        return stats

    def apply_epoch(self, epoch: int, events: DataFrame) -> EpochStats:
        """Apply one epoch atomically: dedup → (evolve schema) → merge → commit."""
        t0 = time.time()
        events_in = events.count() if self.count_input else -1

        # ---- schema evolution (additive columns / widening) ----
        incoming = T.StructType(
            [f for f in events.schema.fields if f.name not in ("lsn", "epoch", "op", "event_ts")]
        )
        target = self.table.schema
        if not is_write_compatible(incoming, target):
            target = merge_schemas(target, incoming)
            self.table.evolve_schema(target)  # idempotent metadata commit
            target = self.table.schema

        # ---- LWW dedup (one row per key) ----
        slim = events.select(self.key, self.order, self.op_col, *
                             [f.name for f in target.fields if f.name != self.key
                              and f.name in events.columns])
        use_salt = self.salt == "on" or (
            self.salt == "auto"
            and self.dedup_mode in ("grouped", "partition")
            and is_skewed(slim, self.key, self.hot_threshold, sample_fraction=0.05)
        )
        if use_salt:
            deduped = lww_dedup_salted(
                slim, self.key, self.order, salt_n=self.salt_n, mode=self.dedup_mode
            )
        else:
            deduped = lww_dedup(slim, self.key, self.order, mode=self.dedup_mode)
        deduped = deduped.withColumn(
            BUCKET_COL, bucket_id(F.col(self.key), self.table.num_buckets)
        )
        deduped = deduped.persist()
        try:
            # ---- lineage pre-aggregation (tiny: ≤ num_buckets rows) ----
            lin = (
                deduped.groupBy(BUCKET_COL)
                .agg(
                    F.sum(F.when(F.col(self.op_col) != OP_DELETE, 1).otherwise(0)).alias("ups"),
                    F.sum(F.when(F.col(self.op_col) == OP_DELETE, 1).otherwise(0)).alias("dels"),
                    F.min(self.order).alias("lsn_start"),
                    F.max(self.order).alias("lsn_end"),
                )
                .collect()
            )
            affected = [int(r[BUCKET_COL]) for r in lin]
            rows_upserted = sum(int(r["ups"]) for r in lin)
            rows_deleted = sum(int(r["dels"]) for r in lin)

            if not affected:  # empty epoch: manifest row, no data change
                self.table._commit(
                    {},
                    None,
                    None,
                    {WATERMARK_PROP: epoch},
                    [self._lineage_row(epoch, -1, None, None, 0, 0, 0, t0)],
                )
                return EpochStats(epoch, events_in, 0, 0, 0, time.time() - t0)

            # ---- merge into affected buckets only ----
            current = self.table.read(affected)
            state_cols = [f.name for f in target.fields]
            delta = deduped.drop(BUCKET_COL)
            # coerce payload to target types (null-fill/widen) while carrying op
            target_plus_op = T.StructType(
                list(target.fields) + [T.StructField(self.op_col, T.StringType())]
            )
            aligned = compat_select(delta, target_plus_op)
            merged = merge_delta(
                current, aligned, key=self.key, op_col=self.op_col, payload_cols=state_cols
            )

            lineage_rows = [
                self._lineage_row(
                    epoch,
                    int(r[BUCKET_COL]),
                    int(r["lsn_start"]),
                    int(r["lsn_end"]),
                    int(r["ups"]),
                    int(r["dels"]),
                    0,
                    t0,
                )
                for r in lin
            ]
            self.table.overwrite_buckets(
                affected,
                merged,
                key_col=self.key,
                properties_update={WATERMARK_PROP: epoch},
                lineage=lineage_rows,
            )
            return EpochStats(
                epoch, events_in, rows_upserted, rows_deleted, len(affected), time.time() - t0
            )
        finally:
            deduped.unpersist()

    # ---------------- helpers ----------------

    def _lineage_row(
        self,
        epoch: int,
        partition_id: int,
        lsn_start: int | None,
        lsn_end: int | None,
        ups: int,
        dels: int,
        bytes_written: int,
        t0: float,
    ) -> dict[str, Any]:
        return {
            "epoch": epoch,
            "partition_id": partition_id,
            "lsn_start": lsn_start,
            "lsn_end": lsn_end,
            "rows_upserted": ups,
            "rows_deleted": dels,
            "bytes_written": bytes_written,
            "apply_latency_ms": int((time.time() - t0) * 1000),
            "committed_at": time.time(),
        }
