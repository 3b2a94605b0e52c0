"""Public-data JSON export sink.

Analog of the reference's ``bigquery_etl/public_data/publish_json.py``
(349 LoC: query result → ndjson[.gz] files on GCS via smart_open): here a
thin declarative wrapper over ``df.write.json`` — gzip codec, optional
single-file coalesce for small exports, ISO timestamp rendering. All
JVM-side; no driver-side row loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def publish_json(
    df: DataFrame,
    path: str,
    gzip: bool = True,
    single_file: bool = False,
    timestamp_format: str = "yyyy-MM-dd'T'HH:mm:ss'Z'",
) -> None:
    out = df.coalesce(1) if single_file else df
    writer = (
        out.write.mode("overwrite")
        .option("timestampFormat", timestamp_format)
        # parquet-sourced timestamps are often NTZ in Spark 4; format both
        .option("timestampNTZFormat", timestamp_format)
    )
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.json(path)
