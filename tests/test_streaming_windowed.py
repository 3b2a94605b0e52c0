"""Structured Streaming tumbling-window aggregate: equality with the batch
form, and watermark late-data semantics."""

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from bigquery_etl_fork_spark.streaming.windowed import tumbling_window_counts

SF = "/root/testdata/sf0.001"


def test_streaming_hourly_equals_batch(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        tumbling_window_counts(stream, ts_col="ts", keys=("event_type",), user_col=None)
        .writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hourly_stream").collect()
    }
    batch = spark.read.parquet(str(src)).groupBy(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    exp = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    assert got == exp
    # and against an independent engine
    dd = duckdb.sql(
        f"SELECT count(*) FROM (SELECT date_trunc('hour', ts), event_type "
        f"FROM read_parquet('{src}/events.parquet') GROUP BY 1, 2)"
    ).fetchone()[0]
    assert len(got) == dd


def test_streaming_window_append_finalizes_exactly_once(spark, tmp_path):
    """Append-mode guarantees (what the watermark actually promises in
    Spark): a window is emitted EXACTLY ONCE, only after the watermark
    passes its end, with the full count at finalization time — and windows
    the watermark hasn't passed are never emitted. (NOT tested: dropping of
    very-late rows — Spark documents that data later than the watermark
    'may or may not' be aggregated, and measured behavior here is that it
    still is; only state eviction is deterministic.)"""
    import time

    src = tmp_path / "late"
    src.mkdir()

    def write(rows, name):
        df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
            F.to_timestamp("ts_s").alias("ts"), "event_type"
        )
        df.coalesce(1).write.parquet(str(src / name))
        time.sleep(1.1)  # distinct mtimes -> deterministic file-source order

    write([("2024-01-01 10:15:00", "click"), ("2024-01-01 12:00:00", "click")], "f1")
    write([("2024-01-01 12:30:00", "click")], "f2")
    write([("2024-01-01 15:00:00", "click")], "f3")  # advances watermark to 13:00

    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        tumbling_window_counts(
            stream, ts_col="ts", keys=("event_type",), watermark="2 hours", user_col=None
        )
        .writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT window_start, n_events FROM late_stream").collect()
    got = [(str(r["window_start"])[:13], r["n_events"]) for r in rows]
    # exactly-once: no window emitted twice
    assert len(got) == len(set(w for w, _ in got)), got
    # finalized windows (end <= final watermark 13:00) carry full counts —
    # including the 12:00 window whose 12:30 event arrived a batch later
    assert set(got) == {("2024-01-01 10", 1), ("2024-01-01 12", 2)}, got
    # the 15:00 window is beyond the watermark: never emitted
