#!/usr/bin/env python
"""spark-submit entrypoint: replay a change log into a lake table.

Usage (local example; on a cluster swap --master and add executors):

    cd /root/repo && zip -qr /tmp/engine.zip bigquery_etl_fork_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        scripts/replay_job.py \
        --base /path/base_sequences.parquet \
        --log /path/change_log \
        --table /path/lake_table \
        --num-buckets 64 [--tail] [--storage-mode mor] [--dedup-mode jvm]

Creates the table from the base snapshot when it doesn't exist, then
replays (or tails) the log with exactly-once epoch fencing. Safe to re-run
from any crash point. Prints one JSON summary line.
"""

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="base snapshot parquet")
    ap.add_argument("--log", required=True, help="epoch-partitioned change-log dir")
    ap.add_argument("--table", required=True, help="lake table root")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--storage-mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--dedup-mode", default="jvm", choices=["jvm", "grouped", "partition"])
    ap.add_argument("--tail", action="store_true", help="keep polling for new epochs")
    ap.add_argument("--poll-interval", type=float, default=5.0)
    ap.add_argument("--max-idle-polls", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cdc-replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable
    from bigquery_etl_fork_spark.streaming.micro_batch import tail_changelog

    base = spark.read.parquet(args.base)
    if LakeTable.exists(args.table):
        table = LakeTable(spark, args.table)
    else:
        table = LakeTable.create(spark, args.table, base.schema, num_buckets=args.num_buckets)
    # base_loaded is recorded atomically WITH the base-load commit: a crash
    # between create() and here leaves a valid-but-empty table, and this
    # re-run redoes the base load instead of replaying onto nothing. Once
    # any epoch watermark exists the log is already layered on top, so the
    # base must not be rewritten.
    props = table.snapshot.properties
    if not props.get("base_loaded") and props.get("epoch_watermark") is None:
        table.overwrite_all(base, key_col=args.key, properties_update={"base_loaded": True})

    eng = CDCEngine(
        spark,
        table,
        key=args.key,
        storage_mode=args.storage_mode,
        dedup_mode=args.dedup_mode,
        count_input=False,
    )
    t0 = time.time()
    if args.tail:
        stats = tail_changelog(
            eng, args.log, poll_interval_s=args.poll_interval, max_polls=args.max_idle_polls
        )
    else:
        stats = eng.replay(spark.read.parquet(args.log))
    wall = time.time() - t0
    applied = [e.epoch for e in stats.epochs if not e.skipped]
    out = {
        "applied_epochs": applied,
        "skipped_epochs": [e.epoch for e in stats.epochs if e.skipped],
        "rows_upserted": sum(e.rows_upserted for e in stats.epochs),
        "rows_deleted": sum(e.rows_deleted for e in stats.epochs),
        "watermark": table.snapshot.properties.get("epoch_watermark"),
        "snapshot_version": table.snapshot.version,
        "seconds": round(wall, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
