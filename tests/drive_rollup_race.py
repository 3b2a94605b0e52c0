"""Multi-process CDC-tailer vs IncrementalRollup-refresher race drive.

Invoked as a subprocess by test_round4_fixes.py (and usable standalone):

    python tests/drive_rollup_race.py tailer    <work_dir>
    python tests/drive_rollup_race.py refresher <work_dir> <name>
    python tests/drive_rollup_race.py check     <work_dir>

One tailer applies N_EPOCHS epochs to the source table while TWO
refresher processes race ``IncrementalRollup.refresh()`` loops against
the same rollup target. The version fence must yield exactly-once rollup
state: after everything settles, the rollup equals a flat GROUP BY of the
final source state and its version pointer equals the source head version
(VERDICT r3 #8 — composing the round-3 concurrent-tailer and
streaming-refresh drives into one race).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EPOCHS = 6
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
        # hi/lo: extrema measures exercise the partials-sidecar path under
        # the race — a refresher that loses the commit race must re-read
        # the winner's partials snapshot too, or it re-conflicts forever
        # (ADVICE r4; count/sum alone never touched the partials table)
        measures={
            "n": ("count", None),
            "total": ("sum", "val"),
            "hi": ("max", "val"),
            "lo": ("min", "val"),
        },
    )


def main():
    role, work = sys.argv[1], sys.argv[2]
    from pyspark.sql import functions as F

    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable

    src_root = os.path.join(work, "src")

    if role == "gen":
        spark = get_spark("race-gen")
        rows = [(f"d{i}", f"g{i % 5}", i) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id string, grp string, val long")
        t = LakeTable.create(
            spark, src_root, df.schema, num_buckets=4,
            properties={"key_col": "doc_id"},
        )
        t.overwrite_all(df, key_col="doc_id")
        mv = mk_rollup(spark, t, work)
        mv.refresh()  # bootstrap (full) before the race starts
        print(json.dumps({"phase": "gen", "version": t.snapshot.version}))

    elif role == "tailer":
        spark = get_spark("race-tailer")
        t = LakeTable(spark, src_root)
        eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
        for e in range(1, N_EPOCHS + 1):
            rows = []
            for i in range(ROWS_PER_EPOCH):
                k = (e * 37 + i * 11) % 160  # mix of updates and inserts
                rows.append(
                    (f"d{k}", f"g{k % 5}", e * 1000 + i, e * 100 + i, "U")
                )
            # a few deletes per epoch
            rows.append((f"d{(e * 13) % 100}", None, None, e * 100 + 99, "D"))
            delta = spark.createDataFrame(
                rows, "doc_id string, grp string, val long, lsn long, op string"
            )
            eng.apply_epoch(e, delta)
            time.sleep(0.3)  # let refreshers interleave mid-stream
        print(json.dumps({"phase": "tailer", "version": t.snapshot.version}))

    elif role == "refresher":
        name = sys.argv[3]
        spark = get_spark(f"race-refresh-{name}")
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
        print(json.dumps({"phase": "refresher", "name": name, "modes": modes}))

    elif role == "check":
        spark = get_spark("race-check")
        t = LakeTable(spark, src_root)
        mv = mk_rollup(spark, t, work)
        got = {
            r["grp"]: (r["n"], r["total"], r["hi"], r["lo"])
            for r in mv.read().collect()
        }
        exp = {
            r["grp"]: (r["n"], r["total"], r["hi"], r["lo"])
            for r in t.read(key_col="doc_id")
            .groupBy("grp")
            .agg(
                F.count("*").alias("n"),
                F.sum("val").alias("total"),
                F.max("val").alias("hi"),
                F.min("val").alias("lo"),
            )
            .collect()
        }
        print(
            json.dumps(
                {
                    "phase": "check",
                    "ok": got == exp
                    and mv.last_source_version == t.snapshot.version,
                    "got": got,
                    "exp": exp,
                    "mv_source_version": mv.last_source_version,
                    "src_version": t.snapshot.version,
                }
            )
        )
    else:
        raise SystemExit(f"unknown role {role}")


if __name__ == "__main__":
    main()
