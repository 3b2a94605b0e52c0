"""10^8-event calibrated soak (VERDICT r4 #7).

One order of magnitude beyond the round-3 soak (10.4M): ~10^8 delivered
change events replayed through the full engine, with the pre-JVM host
calibration probe and min-of-N protocol, reporting throughput and the
per-epoch latency band. Each calibrated decade of measured evidence moves
the 10^10 north-star claim further from extrapolation.

The change log is generated in PER-EPOCH CHUNKS (datagen.change_log holds
its whole output in RAM — 10^8 events with token payloads would be ~54 GB
plus copies; 10 x 10^7 chunks peak ~12 GB). Chunks get shifted lsn ranges
and constant epoch ids, so the replayed log is globally lsn-monotone with
one binlog segment per epoch, same layout as write_dataset.

Run on tmpfs (the vda disk saturates — BASELINE.md):
    TMPDIR=/dev/shm SOAK_DIR=/dev/shm/soak python scripts/soak_1e8.py
Env: SOAK_EVENTS (1e8), SOAK_EPOCHS (10), SOAK_DOCS (1e6),
     SOAK_REPEAT (2), SOAK_TOKLEN (16,256), SPARK_GRAFT_CPUS (32).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> None:
    n_events = int(float(os.environ.get("SOAK_EVENTS", 1e8)))
    n_epochs = int(os.environ.get("SOAK_EPOCHS", 10))
    n_docs = int(float(os.environ.get("SOAK_DOCS", 1e6)))
    repeat = int(os.environ.get("SOAK_REPEAT", 2))
    min_len, max_len = (
        int(x) for x in os.environ.get("SOAK_TOKLEN", "16,256").split(",")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = os.environ.get("SOAK_DIR", "/dev/shm/soak_1e8")

    from bench import _calibrate

    cal = _calibrate()

    from bigquery_etl_fork_spark import datagen

    per_epoch = n_events // n_epochs
    log_path = os.path.join(work, "change_log")
    base_path = os.path.join(work, "base_sequences.parquet")
    marker = os.path.join(work, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        t0 = time.time()
        pq.write_table(
            datagen.base_table(
                n_docs=n_docs, seed=42, min_len=min_len, max_len=max_len
            ),
            base_path,
        )
        for e in range(1, n_epochs + 1):
            tbl = datagen.change_log(
                n_docs=n_docs,
                n_events=per_epoch,
                n_epochs=1,
                seed=42 + e,
                min_len=min_len,
                max_len=max_len,
                new_doc_start=n_docs + (e - 1) * per_epoch // 10,
            )
            n = len(tbl)
            tbl = tbl.set_column(
                0, "lsn",
                pa.array(
                    tbl["lsn"].to_numpy(zero_copy_only=False)
                    + (e - 1) * np.int64(per_epoch)
                ),
            )
            tbl = tbl.set_column(
                1, "epoch", pa.array(np.full(n, e, dtype=np.int32))
            )
            pq.write_to_dataset(
                tbl, log_path, partition_cols=["epoch"], row_group_size=16384
            )
            print(json.dumps({"gen_epoch": e, "rows": n}), flush=True)
        open(marker, "w").close()
        print(json.dumps({"gen_sec": round(time.time() - t0, 1)}), flush=True)

    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable
    from bigquery_etl_fork_spark.session import get_spark

    spark = get_spark(
        "soak-1e8", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    base = spark.read.parquet(base_path)
    log = spark.read.parquet(log_path)
    total = log.count()

    runs = []
    for i in range(repeat):
        root = os.path.join(work, f"tbl_{i}")
        shutil.rmtree(root, ignore_errors=True)
        table = LakeTable.create(
            spark, root, base.schema, num_buckets=64,
            properties={"key_col": "doc_id"},
        )
        table.overwrite_all(base, key_col="doc_id")
        eng = CDCEngine(spark, table, count_input=False)
        t0 = time.time()
        stats = eng.replay(log)
        wall = time.time() - t0
        lat = [round(s.latency_s, 1) for s in stats.epochs if not s.skipped]
        runs.append(
            {
                "seconds": round(wall, 1),
                "events_per_sec": round(total / wall, 1),
                "epoch_latency_sec": lat,
                "final_rows": table.read().count(),
            }
        )
        print(json.dumps({"run": i, **runs[-1]}), flush=True)
        shutil.rmtree(root, ignore_errors=True)

    best = min(r["seconds"] for r in runs)
    print(
        json.dumps(
            {
                "probe": "soak_1e8",
                "events": total,
                "docs": n_docs,
                "epochs": n_epochs,
                "cpus": cpus,
                "host_calibration": cal,
                "best_seconds": best,
                "best_events_per_sec": round(total / best, 1),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
