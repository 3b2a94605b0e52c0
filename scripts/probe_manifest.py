"""Manifest / metadata-plane scalability probe (round 5).

At 10^10-event scale the data plane is Spark + Parquet, but the METADATA
plane — the snapshot manifest every commit rewrites and every read plans
from — is driver-side JSON. This probe measures how commit latency,
manifest size, and read planning cost grow as delta commits accumulate
files, and how compaction + snapshot expiry + vacuum pull them back down:
the numbers that tell you the LSM maintenance cadence keeps the metadata
plane O(live files), not O(history).

Run: python scripts/probe_manifest.py   (small data, ~2-3 min)
Env: PROBE_COMMITS (default 200), PROBE_BUCKETS (16)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigquery_etl_fork_spark.lake import LakeTable  # noqa: E402
from bigquery_etl_fork_spark.session import get_spark  # noqa: E402


def snap_bytes(t: LakeTable) -> int:
    d = os.path.join(t.root, "_snapshots")
    latest = sorted(f for f in os.listdir(d) if f.startswith("snap-"))[-1]
    return os.path.getsize(os.path.join(d, latest))


def n_files(t: LakeTable) -> int:
    return sum(len(v) for v in t.snapshot.buckets.values())


def plan_ms(t: LakeTable) -> float:
    t0 = time.time()
    df = t.read(key_col="doc_id")  # manifest walk + DataFrame build, no job
    _ = df.schema
    return round((time.time() - t0) * 1000, 1)


def main() -> None:
    n_commits = int(os.environ.get("PROBE_COMMITS", 200))
    nb = int(os.environ.get("PROBE_BUCKETS", 16))
    spark = get_spark("probe-manifest", master="local[8]", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="probe_manifest_")

    base = spark.range(10_000).select(
        F.format_string("d%06d", F.col("id")).alias("doc_id"),
        F.col("id").alias("val"),
        F.lit(-1).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
    ).drop("lsn", "op")
    t = LakeTable.create(
        spark, os.path.join(root, "t"), base.schema, num_buckets=nb,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(base, key_col="doc_id")

    checkpoints = []
    commit_secs = []
    for i in range(1, n_commits + 1):
        delta = spark.range(100).select(
            F.format_string("d%06d", (F.col("id") * 37 + i) % 10_000).alias("doc_id"),
            (F.col("id") + i * 1000).alias("val"),
            (F.lit(i) * 1000 + F.col("id")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        t0 = time.time()
        t.append_delta(list(range(nb)), delta, key_col="doc_id")
        commit_secs.append(time.time() - t0)
        if i in (1, 50, 100, 200, 400) or i == n_commits:
            checkpoints.append(
                {
                    "commits": i,
                    "files": n_files(t),
                    "manifest_bytes": snap_bytes(t),
                    "commit_sec": round(commit_secs[-1], 3),
                    "commit_sec_min_last10": round(min(commit_secs[-10:]), 3),
                    "read_plan_ms": plan_ms(t),
                }
            )
            print(json.dumps(checkpoints[-1]), flush=True)

    # maintenance: fold deltas, drop history, delete dead files
    t0 = time.time()
    t.compact_buckets(list(range(nb)), key_col="doc_id")
    compact_sec = round(time.time() - t0, 2)
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    after = {
        "files_after_compact": n_files(t),
        "manifest_bytes_after": snap_bytes(t),
        "read_plan_ms_after": plan_ms(t),
        "compact_sec": compact_sec,
        "files_vacuumed": removed,
    }
    print(
        json.dumps(
            {
                "probe": "manifest_scaling",
                "buckets": nb,
                "commits": n_commits,
                "checkpoints": checkpoints,
                "maintenance": after,
            }
        )
    )


if __name__ == "__main__":
    main()
