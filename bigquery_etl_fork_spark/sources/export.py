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


def export_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int,
    rows_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write a training dataset as deterministically pre-shuffled shards.

    Trainers want (a) data order decorrelated from ingest order, (b) the
    SAME order on every run (resumable/debuggable epochs), (c) bounded,
    even shard files a loader can stripe across workers. Random
    shuffles give (a) but not (b); this gives all three by ordering on a
    cross-engine-stable md5 uniform of the key:

    - shard  = md5_uniform32(key) mod num_shards  (even, content-addressed)
    - order  = (md5_uniform32(key), key) within a shard  (total, stable)

    One range-free exchange (repartition on the shard id) + an in-shard
    sort; ``rows_per_file`` caps file size via maxRecordsPerFile so a
    100-TB export still yields loader-friendly files without a second
    shuffle. Re-running over the same rows writes byte-identical shard
    MEMBERSHIP and ORDER regardless of input partitioning."""
    out = (
        _with_shard_cols(df, key_col, num_shards)
        .repartition("_shard")
        .sortWithinPartitions("_shard", "_u", key_col)
    )
    writer = out.drop("_u").write.mode("overwrite").partitionBy("_shard")
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", rows_per_file)
    getattr(writer, fmt)(path)


def _with_shard_cols(df: DataFrame, key_col: str, num_shards: int) -> DataFrame:
    """The shard math shared by the sink and its oracle-able plan:
    _shard = md5_uniform32(key) mod num_shards, _u = the uniform itself."""
    from pyspark.sql import functions as F

    from ..functions import md5_uniform32

    u = md5_uniform32(F.col(key_col))
    return df.withColumn("_shard", (u % num_shards).cast("int")).withColumn("_u", u)


def shard_plan(df: DataFrame, key_col: str, num_shards: int) -> DataFrame:
    """The logical layout ``export_training_shards`` writes, as a relation:
    (shard, order_rank, *payload). Pure md5 math over the key — exactly
    reproducible in any SQL engine, so the sink's membership and order are
    oracle-checkable without reading files back (the file-level behavior is
    pinned against this plan in tests)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rank = F.row_number().over(
        W.partitionBy("_shard").orderBy("_u", key_col)
    )
    return (
        _with_shard_cols(df, key_col, num_shards)
        .select(
            F.col("_shard").alias("shard"),
            rank.alias("order_rank"),
            *[c for c in df.columns],
        )
    )
