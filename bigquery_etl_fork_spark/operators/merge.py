"""MERGE-style upsert/delete plan over a bucketed current-state DataFrame.

The DataFrame re-expression of the reference's two apply primitives:

- upsert  ≈ ``MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT``
  (reference ``sql/moz-fx-data-shared-prod/mozilla_org_derived/ga_sessions_v2/
  script.sql:459-537``)
- delete  ≈ the shredder's anti-join partition rewrite: ``LEFT JOIN … ON key
  WHERE right IS NULL`` (reference ``bigquery_etl/shredder/delete.py:377-427``)

Spark-first shape: ``new_state = (current LEFT ANTI JOIN delta_keys) UNION
upserts``. The anti join's build side is the *delta key set* — per epoch this
is usually small relative to table state, so broadcasting it keeps the big
current-state side un-shuffled. The broadcast hint is GATED by the caller
(``broadcast_keys``): an explicit ``F.broadcast()`` forces BroadcastHashJoin
regardless of size (Spark's 8 GiB / 512M-row broadcast limits would fail a
huge delta, or OOM the driver first), so the engine passes
``broadcast_keys=False`` above its key-count threshold and lets the planner
pick a shuffled join instead. At 10^10-event scale with bucket pruning, an
epoch's merge cost is: scan affected buckets + anti join + one
bucket-clustering shuffle of the merged output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"

# "auto" broadcast ceiling: matches the engine's broadcast_key_limit default
# (CDCEngine). Key rows above this would brush Spark's hard 8 GiB / 512M-row
# broadcast limits (or OOM the driver first).
BROADCAST_KEY_LIMIT = 2_000_000


def _maybe_broadcast(
    delta_keys: DataFrame,
    broadcast_keys: bool | str,
    delta_key_count: int | None,
) -> DataFrame:
    """Apply the broadcast hint per the caller's policy.

    ``broadcast_keys="auto"`` (the default) only forces a broadcast when the
    caller supplies a ``delta_key_count`` at or under ``BROADCAST_KEY_LIMIT``
    — with no count, the hint is OMITTED and Catalyst/AQE pick the join
    strategy from observed sizes, which is the safe default for a bare
    operator call (a forced broadcast of an unexpectedly huge delta is the
    scale foot-gun). Explicit ``True``/``False`` keep full caller control
    (the engine gates on its probe's key count)."""
    if broadcast_keys == "auto":
        broadcast_keys = (
            delta_key_count is not None and delta_key_count <= BROADCAST_KEY_LIMIT
        )
    if broadcast_keys:
        return F.broadcast(delta_keys)
    return delta_keys


def merge_delta(
    current: DataFrame,
    deduped_delta: DataFrame,
    key: str = "doc_id",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
    broadcast_keys: bool | str = "auto",
    delta_keys: DataFrame | None = None,
    delta_key_count: int | None = None,
) -> DataFrame:
    """Apply a LWW-deduped delta (one row per key, with op I/U/D) to current.

    Returns the new state:
      - keys present in delta with op D  -> removed
      - keys present with op I/U         -> delta payload wins
      - all other current rows           -> carried through untouched
    Absent-key deletes are no-ops (anti join semantics), matching the
    shredder's behavior on already-deleted rows.

    ``delta_keys`` may supply the key set from a cheaper (column-pruned)
    subtree than the payload-carrying delta — it must cover exactly the same
    keys.
    """
    if payload_cols is None:
        payload_cols = [c for c in current.columns]
    if delta_keys is None:
        delta_keys = deduped_delta.select(key)
    else:
        delta_keys = delta_keys.select(key).distinct()
    delta_keys = _maybe_broadcast(delta_keys, broadcast_keys, delta_key_count)
    survivors = current.join(delta_keys, on=key, how="left_anti")
    upserts = deduped_delta.where(F.col(op_col) != OP_DELETE).select(
        *[F.col(c) for c in payload_cols]
    )
    return survivors.select(*payload_cols).unionByName(upserts)


def merge_delta_clustered(
    current: DataFrame,
    deduped_delta: DataFrame,
    bucket_expr,
    bucket_col: str,
    key: str = "doc_id",
    op_col: str = "op",
    payload_cols: list[str] | None = None,
    delta_keys: DataFrame | None = None,
    broadcast_keys: bool | str = "auto",
    delta_key_count: int | None = None,
) -> DataFrame:
    """merge_delta variant whose output is bucket-clustered WITHOUT shuffling
    the current-state side.

    - survivors keep the partitioning of the state scan (per-bucket files →
      per-bucket tasks): anti join (broadcast when ``broadcast_keys``) + a
      per-row bucket expression, zero shuffle of state bytes;
    - only the (small) upsert delta is repartitioned on the bucket column.

    At 10^10-event scale this is the difference between shuffling the whole
    affected table state every epoch and shuffling just the delta. For an
    epoch whose distinct key set is too big to broadcast, pass
    ``broadcast_keys=False``: the planner shuffles both sides on the key
    (sort-merge/shuffled-hash anti), which is the correct plan there.
    """
    if payload_cols is None:
        payload_cols = list(current.columns)
    if delta_keys is None:
        delta_keys = deduped_delta.select(key)
    else:
        delta_keys = delta_keys.select(key).distinct()
    delta_keys = _maybe_broadcast(delta_keys, broadcast_keys, delta_key_count)
    survivors = (
        current.join(delta_keys, on=key, how="left_anti")
        .select(*payload_cols)
        .withColumn(bucket_col, bucket_expr(F.col(key)))
    )
    upserts = (
        deduped_delta.where(F.col(op_col) != OP_DELETE)
        .select(*[F.col(c) for c in payload_cols])
        .withColumn(bucket_col, bucket_expr(F.col(key)))
        .repartition(bucket_col)
    )
    return survivors.unionByName(upserts)
