"""Calibrated interleaved min-of-N re-pin for specific bench queries.

The protocol that closed signlsh_topk_pairs in round 5 (BASELINE.md
"Round-5 signlsh re-pin"), generalized: pre-JVM host calibration, then N
interleaved rounds over the requested queries (interleaving shares any
load window equally across them), min per query, calibration again after.

Run:  python scripts/repin_rollups.py [query ...]
      (default: rollup_minmax rollup_incremental — VERDICT r5 #2 weak pins)
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
      SPARK_GRAFT_CPUS (default 32), REPIN_ROUNDS (default 3)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibrate  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["rollup_minmax", "rollup_incremental"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("REPIN_ROUNDS", "3"))

    cal_before = _calibrate()

    from bigquery_etl_fork_spark.queries import QUERIES
    from bigquery_etl_fork_spark.session import get_spark

    spark = get_spark(
        "repin", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # JIT warmup

    runs: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            t0 = time.time()
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            runs[n].append(dt)
            print(json.dumps({"round": r + 1, "query": n, "sec": dt}), flush=True)
    cal_after = _calibrate()
    ref = {"single_sec": 0.40, "par8_sec": 1.08}
    print(json.dumps({
        "repin": {n: {"runs": rs, "min_sec": min(rs)} for n, rs in runs.items()},
        "sf_dir": sf_dir, "cpus": cpus,
        "host_calibration": {"before": cal_before, "after_in_jvm": cal_after,
                             "reference_unloaded": ref},
        "load_factor_single": round(cal_before["single_sec"] / ref["single_sec"], 2),
        "load_factor_par8": round(cal_before["par8_sec"] / ref["par8_sec"], 2),
    }))


if __name__ == "__main__":
    main()
