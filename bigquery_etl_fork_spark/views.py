"""User-facing, schema-enforcing views — the reference's view layer analog.

The reference publishes a view per stable/derived table whose SELECT coerces
the underlying table to the published schema, so readers see a stable
contract even while the storage schema evolves
(``bigquery_etl/view/__init__.py:37-110``, publish at ``:358``). Spark
analog: a named temp/global view over a DataFrame builder, projected through
``compat_select`` onto the declared schema — added columns surface as typed
NULLs for old data, widened columns are cast, extra internal columns are
hidden. Pure Catalyst projection: the view adds no execution cost beyond the
SELECT it wraps.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schema_evolution import compat_select, is_write_compatible


def publish_view(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    schema: T.StructType | None = None,
    global_view: bool = False,
    strict: bool = False,
) -> DataFrame:
    """CREATE OR REPLACE VIEW analog with schema enforcement.

    ``schema``: the published contract. The view's output is projected onto
    it (missing columns → typed NULL, widening casts applied, column order
    fixed). ``strict=True`` additionally requires the underlying DataFrame
    to be write-compatible with the contract (no incompatible type changes)
    — the reference's view-vs-schema validation. ``global_view`` registers
    in ``global_temp`` (visible across sessions of this SparkContext)."""
    if schema is not None:
        if strict and not is_write_compatible(df.schema, schema):
            raise ValueError(
                f"view {name!r}: underlying schema is not write-compatible "
                f"with the published contract"
            )
        df = compat_select(df, schema)
    if global_view:
        df.createOrReplaceGlobalTempView(name)
    else:
        df.createOrReplaceTempView(name)
    return df


def publish_views(
    spark: SparkSession,
    builders: dict[str, Callable[[], DataFrame]],
    schemas: dict[str, T.StructType] | None = None,
    global_view: bool = False,
) -> dict[str, DataFrame]:
    """Publish a catalog of views (name → builder), the bulk publish path
    (reference ``bqetl view publish``)."""
    out = {}
    for name, build in builders.items():
        out[name] = publish_view(
            spark,
            name,
            build(),
            schema=(schemas or {}).get(name),
            global_view=global_view,
        )
    return out
