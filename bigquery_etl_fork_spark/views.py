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
    fixed; extra underlying columns hidden). ``strict=True`` additionally
    requires every contract column to actually EXIST in the underlying
    DataFrame with a write-compatible type — the reference's view-vs-schema
    validation (a strict view never serves a silently-all-NULL or narrowed
    column). Extra underlying columns are fine in strict mode too: hiding
    them is the view's job, not a contract violation. ``global_view``
    registers in ``global_temp`` (visible across sessions of this
    SparkContext)."""
    if schema is not None:
        if strict:
            present = {f.name.lower(): f for f in df.schema.fields}
            missing = [f.name for f in schema.fields if f.name.lower() not in present]
            if missing:
                raise ValueError(
                    f"view {name!r}: contract columns missing from the "
                    f"underlying relation: {missing}"
                )
            # compare only the contract's slice of the underlying schema so
            # hidden extra columns don't fail the direction check
            sub = T.StructType([present[f.name.lower()] for f in schema.fields])
            if not is_write_compatible(sub, schema):
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
