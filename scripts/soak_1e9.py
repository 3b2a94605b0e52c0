"""10^9-event calibrated soak (round 5, second half).

One further decade beyond the round-5 1e8 soak: ~10^9 delivered change
events replayed through the full engine. Generating 10^9 fresh events is
datagen-bound (~100k ev/s single-process), so the soak pre-generates
SOAK_SEGS independently-seeded segments of SOAK_PER_EPOCH events each
(in parallel processes, in RAM-bounded sub-chunks) and cycles them
across SOAK_EPOCHS epochs, shifting each epoch's lsn range INSIDE the
scan projection (`lsn + epoch_offset` — JVM-side, no rewrite). Segment
lsn ranges are disjoint and monotone, so the replayed log is a valid
ordered binlog; per-epoch dedup/merge/write cost is identical to fresh
segments (same row counts, same key spread); the only repetition is the
key-touch PATTERN every SOAK_SEGS epochs, which is documented, not
hidden.

Correctness at this scale: the LWW winner of every doc is its max-lsn
row in the LAST-USED segment that contains it (epoch shifts dominate
in-segment lsns), so the check recomputes expected final aggregates
(row count, sum(n_tok), count by source) from the segments with one
Spark pass using the segment last-use ranking — an independent
derivation of the same invariant the DuckDB oracle pins at gate scale —
plus exact token-array equality on a 1,000-doc sample.

Run on tmpfs:
    TMPDIR=/dev/shm SOAK_DIR=/dev/shm/soak_1e9 python scripts/soak_1e9.py
Env: SOAK_PER_EPOCH (4e7), SOAK_EPOCHS (25), SOAK_SEGS (3),
     SOAK_DOCS (1e6), SOAK_TOKLEN (16,256), SPARK_GRAFT_CPUS (32).

10^10 mode (the north-star scale itself): the same harness with
    SOAK_EPOCHS=250 SOAK_TBL=<disk path> SOAK_VACUUM_EVERY=10 \
    SOAK_EPOCHS_PER_PROC=50  (+ scripts/soak_supervisor.sh)
Three additions make the extra decade survivable on one machine:
  - SOAK_TBL puts the lake table on DISK while segments + shuffle stay
    on tmpfs (the 1e9 run C OOM-kill was RSS + tmpfs table growth
    crossing physical RAM; the table is the only unbounded tmpfs user).
  - SOAK_VACUUM_EVERY=K runs expire_snapshots(keep_last=4) + vacuum()
    every K epochs so compaction/delta garbage is reclaimed in-line —
    at 250 commits the un-vacuumed table would exceed the disk.
  - SOAK_EPOCHS_PER_PROC=K exits the process cleanly every K applied
    epochs; the supervisor relaunches with SOAK_RESUME=1. This bounds
    JVM RSS growth over hours AND exercises the checkpoint-resume
    contract repeatedly at full scale (every restart is a real
    cold-JVM resume from the committed watermark).
"""

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_segment(work: str, seg: int, per_epoch: int, n_docs: int,
                min_len: int, max_len: int) -> None:
    """Child-process entry: one segment, written in RAM-bounded sub-chunks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigquery_etl_fork_spark import datagen

    seg_dir = os.path.join(work, f"seg_{seg}")
    os.makedirs(seg_dir, exist_ok=True)
    chunk = 10_000_000
    off = 0
    ci = 0
    while off < per_epoch:
        n = min(chunk, per_epoch - off)
        tbl = datagen.change_log(
            n_docs=n_docs, n_events=n, n_epochs=1, seed=1000 + 31 * seg + ci,
            min_len=min_len, max_len=max_len,
            new_doc_start=n_docs + seg * per_epoch // 10,
        )
        tbl = tbl.set_column(
            0, "lsn",
            pa.array(tbl["lsn"].to_numpy(zero_copy_only=False) + np.int64(off)),
        )
        tbl = tbl.drop_columns(["epoch"])
        pq.write_table(tbl, os.path.join(seg_dir, f"part_{ci:03d}.parquet"),
                       row_group_size=16384)
        off += n
        ci += 1


def main() -> None:
    per_epoch = int(float(os.environ.get("SOAK_PER_EPOCH", 4e7)))
    n_epochs = int(os.environ.get("SOAK_EPOCHS", 25))
    n_segs = int(os.environ.get("SOAK_SEGS", 3))
    n_docs = int(float(os.environ.get("SOAK_DOCS", 1e6)))
    min_len, max_len = (
        int(x) for x in os.environ.get("SOAK_TOKLEN", "16,256").split(",")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = os.environ.get("SOAK_DIR", "/dev/shm/soak_1e9")

    from bench import _calibrate

    cal_before = _calibrate()
    print(json.dumps({"cal_before": cal_before}), flush=True)

    marker = os.path.join(work, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        t0 = time.time()
        import pyarrow.parquet as pq

        from bigquery_etl_fork_spark import datagen

        pq.write_table(
            datagen.base_table(n_docs=n_docs, seed=42,
                               min_len=min_len, max_len=max_len),
            os.path.join(work, "base_sequences.parquet"),
        )
        procs = [
            subprocess.Popen([sys.executable, os.path.abspath(__file__),
                              "--gen-segment", str(s)],
                             env={**os.environ, "SOAK_DIR": work})
            for s in range(n_segs)
        ]
        rcs = [p.wait() for p in procs]
        assert all(rc == 0 for rc in rcs), rcs
        open(marker, "w").close()
        print(json.dumps({"gen_sec": round(time.time() - t0, 1)}), flush=True)

    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable
    from bigquery_etl_fork_spark.session import get_spark

    spark = get_spark(
        "soak-1e9", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    segs = [spark.read.parquet(os.path.join(work, f"seg_{s}"))
            for s in range(n_segs)]
    seg_counts = [s.count() for s in segs]
    seg_bytes = [
        sum(os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(work, f"seg_{s}")) for f in fs)
        for s in range(n_segs)
    ]
    total = sum(seg_counts[(e - 1) % n_segs] for e in range(1, n_epochs + 1))

    base = spark.read.parquet(os.path.join(work, "base_sequences.parquet"))
    root = os.environ.get("SOAK_TBL") or os.path.join(work, "tbl")
    vac_every = int(os.environ.get("SOAK_VACUUM_EVERY", "0"))
    max_per_proc = int(os.environ.get("SOAK_EPOCHS_PER_PROC", "0"))
    # SOAK_RESUME=1: reopen the table and continue from the committed
    # epoch watermark — the engine's own crash-resume contract, exercised
    # at 10^9 scale (the first clean run was OOM-killed by the kernel in
    # epoch 25; the resumed run finished it exactly-once).
    resume_from = 0
    if os.environ.get("SOAK_RESUME") == "1" and os.path.exists(root):
        from bigquery_etl_fork_spark.engine.cdc import WATERMARK_PROP

        table = LakeTable(spark, root)
        resume_from = int(table.snapshot.properties.get(WATERMARK_PROP, 0))
        print(json.dumps({"resumed_at_watermark": resume_from}), flush=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
        table = LakeTable.create(spark, root, base.schema, num_buckets=64,
                                 properties={"key_col": "doc_id"})
        table.overwrite_all(base, key_col="doc_id")
    # SOAK_AUTO_MAINT=1 (round 6): the ENGINE owns retention — in-loop
    # consumer-fenced expire+vacuum on its own cadence; the harness's
    # SOAK_VACUUM_EVERY block stays off. Ties the tailer-owned-maintenance
    # claim (probe_auto_maintenance.py) to 10^9 scale.
    auto = os.environ.get("SOAK_AUTO_MAINT") == "1"
    eng = CDCEngine(
        spark, table, count_input=False,
        auto_expire_keep=4 if auto else None,
        auto_vacuum_every=10,
    )

    lat = []
    t0 = time.time()
    applied_this_proc = 0
    for e in range(1, n_epochs + 1):
        if e <= resume_from:
            continue
        if max_per_proc and applied_this_proc >= max_per_proc:
            # Clean per-process exit: the committed watermark IS the
            # checkpoint; the supervisor relaunches with SOAK_RESUME=1.
            print(json.dumps({
                "proc_exit": True, "at_epoch": e - 1,
                "epochs_applied_this_proc": applied_this_proc,
                "proc_replay_sec": round(time.time() - t0, 1),
            }), flush=True)
            spark.stop()
            return
        s = (e - 1) % n_segs
        ev = segs[s].withColumn(
            "lsn", F.col("lsn") + F.lit((e - 1) * (per_epoch + 1)).cast("long")
        )
        st = eng.apply_epoch(e, ev, est_bytes=seg_bytes[s])
        lat.append(round(st.latency_s, 1))
        applied_this_proc += 1
        vac_info = {}
        if auto and e % 10 == 0:
            # engine did (or skipped) its own maintenance inside
            # apply_epoch; sample the outcome for the boundedness record
            vac_info = {
                "tbl_gb": round(sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(root) for f in fs
                ) / 2**30, 1),
                "live_files": sum(
                    len(v) for v in table.snapshot.buckets.values()
                ),
                "auto": True,
            }
        if vac_every and e % vac_every == 0 and e < n_epochs:
            tv = time.time()
            n_exp = table.expire_snapshots(keep_last=4)
            n_vac = table.vacuum()
            tbl_gb = round(sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(root) for f in fs
            ) / 2**30, 1)
            vac_info = {"expired": n_exp, "vacuumed": n_vac,
                        "tbl_gb": tbl_gb,
                        "vac_sec": round(time.time() - tv, 1)}
        # Reap finished epochs' shuffle files NOW: ContextCleaner only
        # deletes them after the driver GCs the shuffle references, and
        # Spark's built-in periodic GC (spark.cleaner.periodicGC.interval)
        # defaults to 30 min — at ~20 GB of shuffle data per epoch the
        # local dirs fill long before that (this exact failure killed the
        # first 1e9 attempt at epoch 11: "No space left on device" in
        # BypassMergeSortShuffleWriter with ~200 GB of dead shuffle files).
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        free_gb = shutil.disk_usage(
            os.environ.get("SPARK_LOCAL_DIRS", "/tmp").split(",")[0]
        ).free >> 30
        print(json.dumps({"epoch": e, "latency_s": lat[-1],
                          "elapsed": round(time.time() - t0, 1),
                          "local_free_gb": free_gb, **vac_info}), flush=True)
    wall = time.time() - t0
    cal_after = _calibrate()

    # ---- independent final-state check (see module docstring) ----
    # winner of each doc = max-lsn row in its LAST-USED segment; rank
    # segments by their last use epoch
    last_use = {s: max(e for e in range(1, n_epochs + 1) if (e - 1) % n_segs == s)
                for s in range(n_segs)}
    ranked = sorted(range(n_segs), key=lambda s: last_use[s])
    u = None
    for rank, s in enumerate(ranked):
        d = segs[s].select("doc_id", "lsn", "op", "n_tok",
                           F.lit(rank).alias("_rk"))
        u = d if u is None else u.unionByName(d)
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("_rk"), F.desc("lsn"))
    winners = (u.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1).drop("_rn", "_rk"))
    alive = winners.where(F.col("op") != "D")
    surv = base.join(winners.select("doc_id"), "doc_id", "anti")
    exp_rows = alive.count() + surv.count()
    exp_ntok = (alive.agg(F.sum("n_tok")).collect()[0][0] or 0) + \
               (surv.agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0] or 0)
    got = table.read(key_col="doc_id")
    got_rows = got.count()
    got_ntok = got.agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0]
    sample_ids = [r["doc_id"] for r in alive.limit(1000).collect()]
    full_alive = None
    for rank, s in enumerate(ranked):
        d = segs[s].where(F.col("doc_id").isin(sample_ids)).withColumn(
            "_rk", F.lit(rank))
        full_alive = d if full_alive is None else full_alive.unionByName(d)
    w_toks = {r["doc_id"]: list(r["tokens"]) for r in
              full_alive.withColumn("_rn", F.row_number().over(w))
              .where((F.col("_rn") == 1) & (F.col("op") != "D"))
              .select("doc_id", "tokens").collect()}
    g_toks = {r["doc_id"]: list(r["tokens"]) for r in
              got.where(F.col("doc_id").isin(sample_ids))
              .select("doc_id", "tokens").collect()}
    sample_ok = all(g_toks.get(k) == v for k, v in w_toks.items())

    print(json.dumps({
        "probe": f"soak_{total:.1e}",
        "events": total, "docs": n_docs, "epochs": n_epochs,
        "resumed_at_watermark": resume_from,
        "events_applied_this_run": sum(
            seg_counts[(e - 1) % n_segs]
            for e in range(resume_from + 1, n_epochs + 1)
        ),
        "segments": n_segs, "per_epoch": per_epoch, "cpus": cpus,
        "host_calibration_before": cal_before,
        "host_calibration_after": cal_after,
        "seconds": round(wall, 1),
        "events_per_sec": round(
            sum(seg_counts[(e - 1) % n_segs]
                for e in range(resume_from + 1, n_epochs + 1)) / wall, 1
        ),
        "epoch_latency_sec": lat,
        "final_rows": got_rows, "expected_rows": exp_rows,
        "sum_n_tok": got_ntok, "expected_sum_n_tok": exp_ntok,
        "rows_match": bool(got_rows == exp_rows),
        "ntok_match": bool(got_ntok == exp_ntok),
        "token_sample_1000_match": bool(sample_ok),
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--gen-segment":
        gen_segment(
            os.environ["SOAK_DIR"], int(sys.argv[2]),
            int(float(os.environ.get("SOAK_PER_EPOCH", 4e7))),
            int(float(os.environ.get("SOAK_DOCS", 1e6))),
            *(int(x) for x in os.environ.get("SOAK_TOKLEN", "16,256").split(",")),
        )
    else:
        main()
