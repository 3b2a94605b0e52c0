"""Hot-key detection and salting plan for skewed CDC deltas.

The reference handles skew by (a) excluding pathological keys
(>150k events/day, ``sql_generators/glean_usage/templates/
baseline_clients_daily_v1.query.sql:105-129``) and (b) splitting hot
partitions into 100 ``sample_id`` hash sub-tasks
(``bigquery_etl/shredder/delete.py:455-526``). Our engine never drops data;
it detects hot keys cheaply and routes the delta through the two-stage salted
LWW reduce (``dedup_lww.lww_dedup_salted``) when any key exceeds a threshold.

Detection is an aggregation, not a collect-of-keys: one pass computing
``max(count per key)`` with map-side partial aggregation. For 10^10-row logs
a sampled variant (``sample_fraction``) bounds the cost; hot keys by
definition survive sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_key_count(df: DataFrame, key: str, sample_fraction: float | None = None) -> int:
    """Largest per-key row count (optionally on a sample, scaled back up)."""
    probe = df.sample(sample_fraction, seed=7) if sample_fraction else df
    row = probe.groupBy(key).count().agg(F.max("count").alias("m")).collect()[0]
    m = row["m"] or 0
    return int(m / sample_fraction) if sample_fraction else int(m)


def is_skewed(
    df: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    sample_fraction: float | None = None,
) -> bool:
    """True when some key's row count exceeds hot_threshold."""
    return max_key_count(df, key, sample_fraction) > hot_threshold
