"""Backfill manager: replay a corrected epoch range into staging, promote.

Re-expresses the reference's declared-backfill workflow
(``bigquery_etl/backfill/parse.py``, ``cli/backfill.py:521-757`` initiate →
validate → ``_copy_backfill_staging_to_prod:894-987``) on the CDC engine:

1. **stage**   — zero-copy clone of prod AT the snapshot preceding the
   backfill range (time travel by epoch watermark);
2. **replay**  — apply the corrected change log from ``from_epoch`` through
   the current head into the staging table (same engine, same fencing);
3. **validate**— post-replay data-quality checks (``engine.checks``);
4. **promote** — atomic snapshot swap adopting the staging state.

The corrected log must cover every epoch from ``from_epoch`` to prod's
current watermark (promote replaces the whole state, exactly as the
reference's staging table supersedes the affected partitions).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..lake import LakeTable
from .cdc import WATERMARK_PROP, CDCEngine
from .checks import Check, run_checks


@dataclass
class BackfillResult:
    base_version: int
    staged_watermark: int
    promoted_version: int


def _version_before_epoch(table: LakeTable, epoch: int) -> int:
    """Latest snapshot version whose committed watermark is < epoch."""
    best = None
    for snap in table.history():
        if snap.properties.get(WATERMARK_PROP, -1) < epoch:
            best = snap.version
        else:
            break
    if best is None:
        raise ValueError(f"no snapshot precedes epoch {epoch}")
    return best


def run_backfill(
    spark: SparkSession,
    prod: LakeTable,
    corrected_log: DataFrame,
    from_epoch: int,
    staging_root: str,
    checks: list[Check] | None = None,
    **engine_kwargs,
) -> BackfillResult:
    base_version = _version_before_epoch(prod, from_epoch)
    staging = prod.clone_at(staging_root, base_version)
    eng = CDCEngine(spark, staging, **engine_kwargs)
    eng.replay(corrected_log.where(corrected_log[eng.epoch_col] >= from_epoch))
    if checks:
        run_checks(staging.read(), checks)  # raises on #fail
    snap = prod.promote_from(staging)
    return BackfillResult(
        base_version=base_version,
        staged_watermark=staging.snapshot.properties.get(WATERMARK_PROP, -1),
        promoted_version=snap.version,
    )
