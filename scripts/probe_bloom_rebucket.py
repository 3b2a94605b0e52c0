"""Bloom file-skip + rebucket probes (round 5 depth features).

Part A — delta key blooms: a PROBE_ROWS-row table takes PROBE_EPOCHS
epochs of N_PER_EPOCH randomly-spread upserts each (scattered keys: the
per-file key min/max spans the bucket, so zone maps cannot prune delta
files). A key-targeted read of K keys then runs with blooms consulted
vs. ignored; the probe reports delta files kept under each and the
read wall time. This is the shredder / rollup-retract shape: deletes of
a handful of keys against a table carrying many uncompacted epochs.

Part B — bucket-count evolution: rebucket(old -> 4*old) on the same
table; reports relayout seconds, that the bucket map quadrupled, that
rows survived exactly, and the apply latency of one more epoch under
the new count.

Run:  python scripts/probe_bloom_rebucket.py
Env:  PROBE_ROWS (default 1_000_000), PROBE_EPOCHS (default 24),
      N_PER_EPOCH (default 2000), PROBE_KEYS (default 10),
      SPARK_GRAFT_CPUS (default 32)

One JSON line per section; paste the summary into BASELINE.md.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigquery_etl_fork_spark.engine import CDCEngine  # noqa: E402
from bigquery_etl_fork_spark.lake import LakeTable  # noqa: E402
from bigquery_etl_fork_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(os.environ.get("PROBE_ROWS", 1_000_000))
    n_epochs = int(os.environ.get("PROBE_EPOCHS", 24))
    per_epoch = int(os.environ.get("N_PER_EPOCH", 2000))
    n_keys = int(os.environ.get("PROBE_KEYS", 10))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import _calibrate

    cal = _calibrate()

    spark = get_spark(
        "probe-bloom-rebucket", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    root = tempfile.mkdtemp(prefix="probe_bloom_") + "/t"

    base = spark.range(n_rows).select(
        F.format_string("d%09d", F.col("id")).alias("doc_id"),
        F.col("id").alias("val"),
    )
    t0 = time.time()
    t = LakeTable.create(
        spark, root, base.schema, num_buckets=16,
        properties={"key_col": "doc_id", "delta_key_bloom": True,
                    "max_file_rows": 200_000},
    )
    t.overwrite_all(base, key_col="doc_id")
    boot_s = round(time.time() - t0, 1)

    # scattered epochs: multiplicative stride spreads each epoch's keys
    # across the whole id space (and therefore across every file's range)
    t0 = time.time()
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    # hold compaction off so the delta pile is what the read must prune
    eng.compact_files_per_bucket = 10**9
    for e in range(1, n_epochs + 1):
        d = spark.range(per_epoch).select(
            F.format_string(
                "d%09d", (F.col("id") * 611957 + e * 101) % n_rows
            ).alias("doc_id"),
            (F.col("id") + e * 1_000_000).alias("val"),
            (F.lit(e) * 100_000 + F.col("id")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        eng.apply_epoch(e, d)
    ingest_s = round(time.time() - t0, 1)

    keys = [f"d{(i * 611957 + 7 * 101) % n_rows:09d}" for i in range(n_keys)]  # epoch-7 keys
    full = {r["doc_id"]: r["val"] for r in
            t.read(key_col="doc_id").where(F.col("doc_id").isin(keys)).collect()}

    def timed_read(label: str) -> dict:
        t0 = time.time()
        got = {r["doc_id"]: r["val"] for r in
               t.read(keys=keys, key_col="doc_id")
               .where(F.col("doc_id").isin(keys)).collect()}
        sec = round(time.time() - t0, 2)
        assert got == full, (label, got, full)
        return {"label": label, "sec": sec, **t.last_read_stats}

    # zone-only: strip the bloom flags in-memory (same files, same ranges)
    flags = []
    for files in t.snapshot.buckets.values():
        for f in files:
            if f.get("bloom"):
                flags.append(f)
                f["bloom"] = False
    zone_only = timed_read("zone_only")
    for f in flags:
        f["bloom"] = True
    with_bloom = timed_read("zone_plus_bloom")
    part_a = {
        "probe": "delta_key_bloom",
        "rows": n_rows, "epochs": n_epochs, "per_epoch": per_epoch,
        "target_keys": n_keys,
        "bootstrap_sec": boot_s, "ingest_sec": ingest_s,
        "zone_only": zone_only, "zone_plus_bloom": with_bloom,
        "correct": True,
    }
    print(json.dumps(part_a))

    # ---- Part B: rebucket ----
    old_nb = t.num_buckets
    n_before = t.read(key_col="doc_id").count()
    t0 = time.time()
    t.rebucket(old_nb * 4)
    rebucket_s = round(time.time() - t0, 1)
    n_after = t.read(key_col="doc_id").count()
    t0 = time.time()
    e = n_epochs + 1
    eng.apply_epoch(e, spark.range(per_epoch).select(
        F.format_string("d%09d", (F.col("id") * 611957 + e * 101) % n_rows).alias("doc_id"),
        (F.col("id") + e * 1_000_000).alias("val"),
        (F.lit(e) * 100_000 + F.col("id")).alias("lsn"),
        F.lit("U").alias("op"),
    ))
    epoch_after_s = round(time.time() - t0, 2)
    part_b = {
        "probe": "rebucket",
        "rows": n_rows, "old_buckets": old_nb, "new_buckets": t.num_buckets,
        "rebucket_sec": rebucket_s,
        "rows_preserved": bool(n_before == n_after),
        "epoch_apply_after_sec": epoch_after_s,
    }
    print(json.dumps(part_b))
    print(json.dumps({"probe": "bloom_rebucket_summary",
                      "host_calibration": cal,
                      "part_a": part_a, "part_b": part_b}))


if __name__ == "__main__":
    main()
