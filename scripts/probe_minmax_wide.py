"""Wide-update extrema-rollup probe (VERDICT r4 #4).

Measures the min/max-rollup refresh cost as the changed-key spread widens:
K randomly-spread updated keys against a PROBE_ROWS-row source (default
10M, 64 buckets, key-clustered base files split at max_file_rows=20k so
zone-map file skipping is observable). For each K the probe reports the
refresh wall time, the changed-bucket count (the honest bound of the
partials path — a wide epoch touches most buckets), and the retract
read's file-skip counts.

Run:  python scripts/probe_minmax_wide.py
Env:  PROBE_ROWS (default 10_000_000), PROBE_KS (default 100,10000,100000),
      SPARK_GRAFT_CPUS (default 32)

One JSON line per K plus a final summary line; paste the summary into
BASELINE.md's probe table.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigquery_etl_fork_spark.engine import CDCEngine, IncrementalRollup  # noqa: E402
from bigquery_etl_fork_spark.lake import LakeTable  # noqa: E402
from bigquery_etl_fork_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(os.environ.get("PROBE_ROWS", 10_000_000))
    ks = [int(x) for x in os.environ.get("PROBE_KS", "100,10000,100000").split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # host calibration BEFORE the JVM (see bench.py): lets a reader
    # normalize this probe against the pinned unloaded references
    from bench import _calibrate

    cal = _calibrate()

    spark = get_spark(
        "probe-minmax-wide", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    root = tempfile.mkdtemp(prefix="probe_minmax_")

    base = (
        spark.range(n_rows)
        .select(
            F.format_string("d%09d", F.col("id")).alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % 1000).cast("string")).alias("grp"),
            F.col("id").alias("val"),
        )
    )
    t0 = time.time()
    src = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        base.schema,
        num_buckets=64,
        properties={"key_col": "doc_id", "max_file_rows": 20_000},
    )
    src.overwrite_all(base, key_col="doc_id")
    bootstrap_write_sec = round(time.time() - t0, 2)

    mv = IncrementalRollup(
        spark,
        src,
        os.path.join(root, "mv"),
        group_cols=["grp"],
        measures={
            "n": ("count", None),
            "total": ("sum", "val"),
            "mx": ("max", "val"),
            "mn": ("min", "val"),
        },
    )
    t0 = time.time()
    mv.refresh()
    bootstrap_rollup_sec = round(time.time() - t0, 2)

    eng = CDCEngine(spark, src, key="doc_id", order="lsn", count_input=False)
    results = []
    for epoch, k in enumerate(ks, start=1):
        stride = max(1, n_rows // k)
        delta = (
            spark.range(k)
            .select(
                F.format_string("d%09d", (F.col("id") * stride) % n_rows).alias("doc_id"),
                F.concat(
                    F.lit("g"), ((F.col("id") * stride) % 1000).cast("string")
                ).alias("grp"),
                (F.col("id") + 1_000_000_000).alias("val"),
                (F.lit(epoch) * 1_000_000 + F.col("id")).alias("lsn"),
                F.lit("U").alias("op"),
            )
        )
        eng.apply_epoch(epoch, delta)
        t0 = time.time()
        res = mv.refresh()
        dt = round(time.time() - t0, 2)
        row = {
            "k_changed_keys": k,
            "refresh_sec": dt,
            "mode": res["mode"],
            "src_buckets_scanned": res.get("src_buckets_scanned"),
            "src_buckets_total": res.get("src_buckets_total"),
            "src_files": res.get("src_files"),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # correctness spot-check at the end: rollup equals flat GROUP BY
    got = {
        r["grp"]: (r["n"], r["total"], r["mx"], r["mn"])
        for r in mv.read().collect()
    }
    exp = {
        r["grp"]: (r["n"], r["total"], r["mx"], r["mn"])
        for r in src.read(key_col="doc_id")
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("total"),
            F.max("val").alias("mx"),
            F.min("val").alias("mn"),
        )
        .collect()
    }
    print(
        json.dumps(
            {
                "probe": "minmax_wide_update",
                "rows": n_rows,
                "cpus": cpus,
                "host_calibration": cal,
                "bootstrap_write_sec": bootstrap_write_sec,
                "bootstrap_rollup_sec": bootstrap_rollup_sec,
                "per_k": results,
                "correct": got == exp,
            }
        )
    )


if __name__ == "__main__":
    main()
