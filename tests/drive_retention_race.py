"""Multi-process retention-fence race drive (VERDICT r5 #3/#4/#5).

    python tests/drive_retention_race.py gen       <work_dir>
    python tests/drive_retention_race.py tailer    <work_dir>
    python tests/drive_retention_race.py refresher <work_dir>
    python tests/drive_retention_race.py vacuum    <work_dir>
    python tests/drive_retention_race.py check     <work_dir>

One CDC tailer with AUTO-MAINTENANCE at maximum pressure (expire to the
newest snapshot + vacuum after EVERY epoch) races one IncrementalRollup
refresher loop AND one external expire+vacuum loop on the same source
table. Without the consumer retention fence, the expiry drops the
refresher's feed-base snapshot almost every cycle and every refresh
degrades to a full recompute; with the fence, the refresher must stay
incremental/noop for the whole run (post-bootstrap), finish exact, and the
table's snapshot chain must stay bounded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EPOCHS = 8
ROWS_PER_EPOCH = 40


def get_spark(app):
    from bigquery_etl_fork_spark.session import get_spark as gs

    return gs(
        app_name=app,
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.ui.enabled": "false"},
    )


def mk_rollup(spark, src, work):
    from bigquery_etl_fork_spark.engine import IncrementalRollup

    return IncrementalRollup(
        spark,
        src,
        os.path.join(work, "mv"),
        group_cols=["grp"],
        measures={"n": ("count", None), "total": ("sum", "val")},
    )


def main():
    role, work = sys.argv[1], sys.argv[2]
    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable

    src_root = os.path.join(work, "src")

    if role == "gen":
        spark = get_spark("ret-gen")
        rows = [(f"d{i}", f"g{i % 5}", i) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
        t = LakeTable.create(
            spark, src_root, df.schema, num_buckets=4,
            properties={"key_col": "doc_id"},
        )
        t.overwrite_all(df, key_col="doc_id")
        mv = mk_rollup(spark, t, work)
        r = mv.refresh()  # bootstrap full BEFORE the race starts
        print(json.dumps({"phase": "gen", "bootstrap_mode": r["mode"],
                          "version": t.snapshot.version}))

    elif role == "tailer":
        spark = get_spark("ret-tailer")
        t = LakeTable(spark, src_root)
        eng = CDCEngine(
            spark, t, key="doc_id", order="lsn", count_input=False,
            # maximum retention pressure: expire to the newest snapshot and
            # vacuum after EVERY applied epoch — only the consumer fence
            # keeps the refresher's feed base alive
            auto_expire_keep=1, auto_vacuum_every=1,
        )
        for e in range(1, N_EPOCHS + 1):
            rows = []
            for i in range(ROWS_PER_EPOCH):
                k = (e * 37 + i * 11) % 160
                rows.append((f"d{k}", f"g{k % 5}", e * 1000 + i, e * 100 + i, "U"))
            rows.append((f"d{(e * 13) % 100}", None, None, e * 100 + 99, "D"))
            delta = spark.createDataFrame(
                rows, "doc_id string, grp string, val long, lsn long, op string"
            )
            eng.apply_epoch(e, delta)
            time.sleep(0.3)  # let the refresher interleave mid-stream
        snaps = os.listdir(os.path.join(src_root, "_snapshots"))
        print(json.dumps({"phase": "tailer", "version": t.snapshot.version,
                          "snapshots_on_disk": len(snaps)}))

    elif role == "refresher":
        spark = get_spark("ret-refresh")
        t = LakeTable(spark, src_root)
        mv = mk_rollup(spark, t, work)
        modes = []
        deadline = time.time() + 120
        while time.time() < deadline:
            r = mv.refresh()
            modes.append(r["mode"])
            wm = t.snapshot.properties.get("epoch_watermark", -1)
            if wm >= N_EPOCHS and r["mode"] == "noop":
                break
            time.sleep(0.1)
        print(json.dumps({"phase": "refresher", "modes": modes,
                          "full_count": modes.count("full")}))

    elif role == "vacuum":
        # external maintenance loop, the shape an operator cron would run:
        # consumer-fenced expiry + age-graced vacuum (the grace spares a
        # concurrent tailer's staged-but-uncommitted files)
        spark = get_spark("ret-vacuum")
        t = LakeTable(spark, src_root)
        cycles = 0
        deadline = time.time() + 120
        while time.time() < deadline:
            t.refresh()
            t.expire_snapshots(keep_last=1, respect_consumers=True)
            t.vacuum(min_age_s=60)
            cycles += 1
            if t.snapshot.properties.get("epoch_watermark", -1) >= N_EPOCHS:
                break
            time.sleep(0.15)
        print(json.dumps({"phase": "vacuum", "cycles": cycles}))

    elif role == "check":
        spark = get_spark("ret-check")
        t = LakeTable(spark, src_root)
        mv = mk_rollup(spark, t, work)
        mv.refresh()  # settle any tail left after the loops exited
        got = {r["grp"]: (r["n"], r["total"]) for r in mv.read().collect()}
        exp = {
            r["grp"]: (r["n"], r["total"])
            for r in t.read(key_col="doc_id")
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
            .collect()
        }
        snaps = len(os.listdir(os.path.join(src_root, "_snapshots")))
        print(json.dumps({
            "phase": "check",
            "ok": got == exp and mv.last_source_version == t.snapshot.version,
            "got": got, "exp": exp,
            "snapshots_on_disk": snaps,
            "consumer_watermarks": t.consumer_watermarks(),
        }))
    else:
        raise SystemExit(f"unknown role {role}")


if __name__ == "__main__":
    main()
