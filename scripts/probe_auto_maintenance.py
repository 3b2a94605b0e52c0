"""Long-drive evidence for tailer-owned maintenance (VERDICT r5 #5).

A bare replay loop — `CDCEngine(auto_expire_keep=…, auto_vacuum_every=…)`
and NOTHING else: no harness expire/vacuum/compact calls — runs a few
hundred epochs while the probe samples, per epoch:

- live data files (manifest bucket lists)
- latest snapshot-manifest bytes (the thing every commit rewrites and
  every read plans from)
- on-disk table bytes (live + not-yet-vacuumed dead files)
- snapshot-chain length (directory entries under _snapshots)

Claim under test: all four stay BOUNDED (sawtooth, not monotone) purely
from the engine's in-loop cadence, i.e. the `probe_manifest.py` planning
cliff is never approached without any operator intervention. Reference
analog: copy_deduplicate's self-contained per-day maintenance loop
(`bigquery_etl/copy_deduplicate.py:250-420`) — maintenance as part of
ingestion, not an external job.

Run:  python scripts/probe_auto_maintenance.py        (~10-15 min)
Env:  PROBE_EPOCHS (default 200), PROBE_EPOCH_ROWS (200_000),
      PROBE_DOCS (100_000), PROBE_BUCKETS (16),
      PROBE_KEEP (4), PROBE_VAC_EVERY (10), SPARK_GRAFT_CPUS (16)

One JSON line every 10 epochs + a summary; paste the summary into
BASELINE.md.
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


def live_files(t: LakeTable) -> int:
    return sum(len(v) for v in t.snapshot.buckets.values())


def snap_bytes(t: LakeTable) -> int:
    d = os.path.join(t.root, "_snapshots")
    latest = sorted(f for f in os.listdir(d) if f.startswith("snap-"))[-1]
    return os.path.getsize(os.path.join(d, latest))


def chain_len(t: LakeTable) -> int:
    d = os.path.join(t.root, "_snapshots")
    return sum(1 for f in os.listdir(d) if f.startswith("snap-"))


def disk_bytes(root: str) -> int:
    total = 0
    for dp, _dn, fns in os.walk(root):
        for fn in fns:
            try:
                total += os.path.getsize(os.path.join(dp, fn))
            except OSError:
                pass
    return total


def main() -> None:
    n_epochs = int(os.environ.get("PROBE_EPOCHS", 200))
    epoch_rows = int(os.environ.get("PROBE_EPOCH_ROWS", 200_000))
    n_docs = int(os.environ.get("PROBE_DOCS", 100_000))
    nb = int(os.environ.get("PROBE_BUCKETS", 16))
    keep = int(os.environ.get("PROBE_KEEP", 4))
    vac_every = int(os.environ.get("PROBE_VAC_EVERY", 10))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    spark = get_spark(
        "probe-auto-maint", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    root = tempfile.mkdtemp(prefix="probe_automaint_") + "/t"

    base = spark.range(n_docs).select(
        F.format_string("d%08d", F.col("id")).alias("doc_id"),
        F.col("id").alias("val"),
    )
    t = LakeTable.create(
        spark, root, base.schema, num_buckets=nb,
        properties={"key_col": "doc_id"},
    )
    t.overwrite_all(base, key_col="doc_id")

    # THE ENTIRE MAINTENANCE CONFIG — nothing below ever calls
    # expire/vacuum/compact on the table directly
    eng = CDCEngine(
        spark, t, key="doc_id", order="lsn", count_input=False,
        auto_expire_keep=keep, auto_vacuum_every=vac_every,
    )

    series = []
    t_start = time.time()
    for e in range(1, n_epochs + 1):
        d = spark.range(epoch_rows).select(
            F.format_string(
                "d%08d", F.pmod(F.xxhash64(F.col("id") + e * 1_000_003), n_docs)
            ).alias("doc_id"),
            (F.col("id") + e).alias("val"),
            (F.lit(e) * 10_000_000 + F.col("id")).alias("lsn"),
            F.lit("U").alias("op"),
        )
        eng.apply_epoch(e, d)
        rec = {
            "epoch": e,
            "live_files": live_files(t),
            "snap_bytes": snap_bytes(t),
            "chain": chain_len(t),
            "disk_mb": round(disk_bytes(os.path.dirname(root)) / 1e6, 1),
        }
        series.append(rec)
        if e % 10 == 0:
            rec["elapsed"] = round(time.time() - t_start, 1)
            print(json.dumps(rec), flush=True)

    lf = [r["live_files"] for r in series]
    sb = [r["snap_bytes"] for r in series]
    ch = [r["chain"] for r in series]
    dk = [r["disk_mb"] for r in series]
    half = len(series) // 2
    summary = {
        "probe": "auto_maintenance",
        "epochs": n_epochs, "epoch_rows": epoch_rows, "docs": n_docs,
        "buckets": nb, "auto_expire_keep": keep,
        "auto_vacuum_every": vac_every,
        "wall_sec": round(time.time() - t_start, 1),
        "live_files": {"max": max(lf), "last": lf[-1],
                       "max_first_half": max(lf[:half]),
                       "max_second_half": max(lf[half:])},
        "snap_bytes": {"max": max(sb), "last": sb[-1],
                       "max_first_half": max(sb[:half]),
                       "max_second_half": max(sb[half:])},
        "chain_len": {"max": max(ch), "last": ch[-1]},
        "disk_mb": {"max": max(dk), "last": dk[-1],
                    "max_first_half": max(dk[:half]),
                    "max_second_half": max(dk[half:])},
        "final_rows": t.read(key_col="doc_id").count(),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
