"""Shredder mitigation: reconcile a backfilled aggregate with deleted data.

Re-expresses ``bigquery_etl/backfill/shredder_mitigation.py`` (886 LoC:
``classify_columns:345``, ``generate_query_with_shredder_mitigation:455``,
template ``shredder_mitigation_query_template.sql:1-22``): when an
aggregate table is re-computed after GDPR deletions, rows that vanished
from the source would silently shrink historical metrics. The mitigation
computes, per dimension combination, the metric delta between the previous
aggregate version and the fresh backfill, and appends a patch row so
totals stay continuous.

DataFrame shape: one full-outer join on the dimension columns + metric
subtraction + a filtered UNION ALL patch — all Catalyst built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def classify_columns(df: DataFrame, dimensions: list[str] | None = None):
    """Split columns into (dimensions, metrics): metrics are numeric columns
    not named as dimensions (reference classify_columns:345 heuristic)."""
    if dimensions is None:
        dimensions = [
            f.name
            for f in df.schema.fields
            if not f.dataType.simpleString().startswith(NUMERIC_TYPES)
        ]
    metrics = [c for c in df.columns if c not in dimensions]
    return dimensions, metrics


def shredder_mitigation_patch(
    previous: DataFrame,
    backfilled: DataFrame,
    dimensions: list[str] | None = None,
) -> DataFrame:
    """Per-dimension metric shortfall rows: previous − backfilled where the
    backfill lost volume (deleted source rows). UNION ALL these onto the
    backfilled aggregate to keep historical totals continuous."""
    dims, metrics = classify_columns(previous, dimensions)
    prev = previous.groupBy(*dims).agg(*[F.sum(m).alias(m) for m in metrics])
    new = backfilled.groupBy(*dims).agg(*[F.sum(m).alias(m) for m in metrics])
    joined = prev.alias("p").join(new.alias("n"), on=dims, how="left")
    deltas = [
        (F.coalesce(F.col(f"p.{m}"), F.lit(0)) - F.coalesce(F.col(f"n.{m}"), F.lit(0))).alias(m)
        for m in metrics
    ]
    patch = joined.select(*dims, *deltas)
    nonzero = None
    for m in metrics:
        c = F.col(m) > 0
        nonzero = c if nonzero is None else (nonzero | c)
    return patch.where(nonzero)


def apply_mitigation(
    previous: DataFrame,
    backfilled: DataFrame,
    dimensions: list[str] | None = None,
) -> DataFrame:
    """backfilled UNION ALL mitigation patch (the template's final shape)."""
    patch = shredder_mitigation_patch(previous, backfilled, dimensions)
    return backfilled.unionByName(patch)
