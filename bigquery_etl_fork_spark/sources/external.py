"""External table sources: CSV / JSON with declared schemas.

Analog of the reference's external tables
(``bigquery_etl/metadata/parse_metadata.py:139-153``:
``ExternalDataFormat.GOOGLE_SHEETS/CSV`` + ``source_uris``) — side inputs
registered as views. Schemas are always declared (no inference) so plans
stay stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    view_name: str | None = None,
) -> DataFrame:
    df = spark.read.schema(schema).option("header", str(header).lower()).csv(path)
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, view_name: str | None = None
) -> DataFrame:
    df = spark.read.schema(schema).json(path)
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df
