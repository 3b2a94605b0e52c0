"""keyed_lookup at scale across auto-rebucket boundaries (VERDICT r5 #8).

A table bootstraps small (16 buckets) and grows ~10M rows under a CDC
tailer with the auto-rebucket policy active, passing through 2 bucket-count
evolutions (16 -> 64 -> 256). At each stage — after bootstrap, after each
auto-rebucket fires — the probe measures a K-key targeted lookup: wall
time, files planned vs total (zone-map + bloom pruning), and value
correctness against an untargeted read. The claim under test: bucket-count
evolution never degrades key-targeted pruning, because rebucket() rewrites
base files key-clustered in the NEW bucket space (fresh zone maps) and
post-rebucket deltas carry blooms keyed to the new space.

Run:  python scripts/probe_growth_lookup.py
Env:  PROBE_BOOT_ROWS (default 2_000_000), PROBE_EPOCH_ROWS (default
      1_000_000), PROBE_KEYS (default 100), SPARK_GRAFT_CPUS (default 32),
      PROBE_THRESHOLD_MB (default 3 — bytes/bucket that triggers growth)

One JSON line per stage + a summary; paste the summary into BASELINE.md.
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
    boot_rows = int(os.environ.get("PROBE_BOOT_ROWS", 2_000_000))
    epoch_rows = int(os.environ.get("PROBE_EPOCH_ROWS", 1_000_000))
    n_keys = int(os.environ.get("PROBE_KEYS", 100))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    thr = int(float(os.environ.get("PROBE_THRESHOLD_MB", "3")) * (1 << 20))

    from bench import _calibrate

    cal = _calibrate()
    spark = get_spark(
        "probe-growth", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    root = tempfile.mkdtemp(prefix="probe_growth_") + "/t"

    base = spark.range(boot_rows).select(
        F.format_string("d%09d", F.col("id")).alias("doc_id"),
        F.col("id").alias("val"),
    )
    t = LakeTable.create(
        spark, root, base.schema, num_buckets=16,
        properties={"key_col": "doc_id", "delta_key_bloom": True,
                    "max_file_rows": 200_000},
    )
    t0 = time.time()
    t.overwrite_all(base, key_col="doc_id")
    boot_s = round(time.time() - t0, 1)

    eng = CDCEngine(
        spark, t, key="doc_id", order="lsn", count_input=False,
        compact_files_per_bucket=4,  # fold deltas fast so base bytes grow
        auto_rebucket_bytes_per_bucket=thr,
        auto_rebucket_factor=4, auto_rebucket_max_buckets=1024,
    )

    def lookup_stage(stage: str, total_rows: int) -> dict:
        # keys spread across the whole id space: worst case for planning
        keys = [f"d{(i * 611957 + 13) % total_rows:09d}" for i in range(n_keys)]
        exp = {r["doc_id"]: r["val"] for r in
               t.read(key_col="doc_id").where(F.col("doc_id").isin(keys)).collect()}
        t0 = time.time()
        got = {r["doc_id"]: r["val"] for r in
               t.read(keys=keys, key_col="doc_id")
               .where(F.col("doc_id").isin(keys)).collect()}
        sec = round(time.time() - t0, 2)
        assert got == exp, stage
        rec = {"stage": stage, "num_buckets": t.num_buckets,
               "rows": total_rows, "lookup_sec": sec, "correct": True,
               **t.last_read_stats}
        print(json.dumps(rec), flush=True)
        return rec

    stages = [lookup_stage("bootstrap", boot_rows)]
    total = boot_rows
    boundaries = []
    e = 0
    while len(boundaries) < 2 and e < 40:
        e += 1
        nb_before = t.num_buckets
        t0 = time.time()
        d = spark.range(epoch_rows).select(
            F.format_string("d%09d", F.col("id") + total).alias("doc_id"),
            (F.col("id") + total).alias("val"),
            (F.lit(e) * 10_000_000 + F.col("id")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        eng.apply_epoch(e, d)
        apply_s = round(time.time() - t0, 1)
        total += epoch_rows
        if t.num_buckets != nb_before:
            boundaries.append({"epoch": e, "from": nb_before,
                               "to": t.num_buckets, "epoch_sec": apply_s})
            print(json.dumps({"rebucket": boundaries[-1]}), flush=True)
            stages.append(lookup_stage(f"after_{nb_before}to{t.num_buckets}",
                                       total))
    stages.append(lookup_stage("final", total))
    print(json.dumps({
        "probe": "growth_lookup_summary",
        "host_calibration": cal,
        "boot_rows": boot_rows, "boot_sec": boot_s,
        "final_rows": total, "epochs": e,
        "rebuckets": boundaries,
        "stages": [{k: v for k, v in s.items()} for s in stages],
    }))


if __name__ == "__main__":
    main()
