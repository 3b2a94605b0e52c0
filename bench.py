"""Benchmark harness.

Default: runs the headline CDC replay (the BASELINE.json metric:
change-events applied/sec through the full engine) plus every
operator-coverage query at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS],
printing ONE JSON line:

    {"metric": "cdc_events_applied_per_sec", "value": N, "unit": "events/sec",
     "queries": {name: seconds, ...}, "sf": 0.1, ...}

Modes:
    python bench.py                 # full bench, one JSON line
    python bench.py --cdc-only      # only the CDC replay (used by --scaling)
    python bench.py --scaling       # same CDC job at 2 parallelism levels
                                    # (local[8] vs local[32]) in separate
                                    # processes; reports throughput at both
                                    # plus scaling efficiency (north-rule
                                    # evidence; see BASELINE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _calibrate() -> dict:
    """Fixed-size host-load probe (VERDICT r3 #1): the official bench can
    land in a loaded host window (documented 2-10x swings — BASELINE.md),
    making engine numbers uninterpretable on their own. This runs a
    deterministic reference workload with a pinned unloaded-host time so any
    reader can normalize: measured/reference = the window's load factor.

    Two probes, same shape as scripts/envelope_probe.py (numpy streaming
    sums — the memory-bound profile of a shuffle-heavy engine):
      - single_sec: one process, 128 MiB x 16 passes (~2 GB moved)
      - par8_sec:   8 barrier-synced processes doing the same concurrently
        (captures bandwidth contention, which parallel Spark stages feel)
    Reference (unloaded) times are pinned in BASELINE.md; min-of-2 here
    rejects one-off scheduler spikes without hiding sustained load."""
    import multiprocessing as mp

    import numpy as np

    bytes_ = 128 * 1024 * 1024
    passes = 64

    def worker(barrier, out, i):
        a = np.random.default_rng(i).random(bytes_ // 8)
        barrier.wait()
        t0 = time.time()
        s = 0.0
        for _ in range(passes):
            s += float(a.sum())
        out[i] = time.time() - t0
        if s == -1:
            print(s)

    def run(n_procs: int) -> float:
        barrier = mp.Barrier(n_procs)
        out = mp.Array("d", n_procs)
        procs = [
            mp.Process(target=worker, args=(barrier, out, i)) for i in range(n_procs)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        return max(out[:])

    res = {}
    for name, n in (("single_sec", 1), ("par8_sec", 8)):
        res[name] = round(min(run(n) for _ in range(2)), 3)
    return res


def _sf() -> float:
    tail = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return 0.1


def _cdc_paths(sf: float, n_epochs: int = 8) -> dict[str, str]:
    """Generate (once, cached by params) the deterministic CDC workload:
    base table + change log sized proportionally to sf. Env overrides
    (SPARK_GRAFT_BENCH_EVENTS/DOCS/TOKLEN) let the scaling harness run a
    bigger-than-sf workload without faking a testdata directory."""
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", max(2000, int(200_000 * sf))))
    n_events = int(
        os.environ.get("SPARK_GRAFT_BENCH_EVENTS", max(50_000, int(20_000_000 * sf)))
    )
    # fixture-faithful token payloads (FIXTURES.md: length 1-2048); avg ~528
    min_len, max_len = (
        int(x) for x in os.environ.get("SPARK_GRAFT_BENCH_TOKLEN", "32,1024").split(",")
    )
    cache = os.path.join(
        tempfile.gettempdir(),
        f"cdc_bench_{n_docs}_{n_events}_{n_epochs}_{min_len}_{max_len}_s42",
    )
    marker = os.path.join(cache, "_DONE")
    if not os.path.exists(marker):
        from bigquery_etl_fork_spark import datagen

        datagen.write_dataset(
            cache,
            n_docs=n_docs,
            n_events=n_events,
            n_epochs=n_epochs,
            seed=42,
            min_len=min_len,
            max_len=max_len,
        )
        open(marker, "w").close()
    return {
        "base": os.path.join(cache, "base_sequences.parquet"),
        "log": os.path.join(cache, "change_log"),
        "n_events": n_events,
        "n_docs": n_docs,
    }


def run_cdc(
    spark,
    sf: float,
    dedup_mode: str = "jvm",
    num_buckets: int = 64,
    repeat: int | None = None,
    n_epochs: int = 8,
) -> dict:
    """Full replay `repeat` times (fresh table each); report the best run —
    the sandbox host has noisy external load, so min is the engine's number.

    n_epochs=8 is the steady-drip shape (per-epoch commit latency included
    8×); n_epochs=1 is the bulk catch-up shape (throughput-bound — the
    regime a 10^10-event log replay actually runs in)."""
    from bigquery_etl_fork_spark.engine import CDCEngine
    from bigquery_etl_fork_spark.lake import LakeTable

    if repeat is None:
        # min-of-3 (VERDICT r3 #1): two runs can BOTH land in one sustained
        # load window; a third materially improves the odds the minimum is
        # the engine's number
        repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    p = _cdc_paths(sf, n_epochs=n_epochs)
    base = spark.read.parquet(p["base"])
    log = spark.read.parquet(p["log"])
    total_events = log.count()  # includes duplicate deliveries
    runs = []
    final_rows = None
    for _ in range(repeat):
        root = tempfile.mkdtemp(prefix="cdc_bench_tbl_")
        table = LakeTable.create(spark, root + "/t", base.schema, num_buckets=num_buckets)
        table.overwrite_all(base, key_col="doc_id")
        eng = CDCEngine(spark, table, dedup_mode=dedup_mode, count_input=False)
        t0 = time.time()
        eng.replay(log)
        runs.append(time.time() - t0)
        if final_rows is None:
            final_rows = table.read().count()
    wall = min(runs)
    return {
        "events": total_events,
        "seconds": round(wall, 3),
        "events_per_sec": round(total_events / wall, 1),
        "all_runs_sec": [round(r, 3) for r in runs],
        "dedup_mode": dedup_mode,
        "num_buckets": num_buckets,
        "n_epochs": n_epochs,
        "n_docs": p["n_docs"],
        "final_rows": final_rows,
    }


def main() -> None:
    from bigquery_etl_fork_spark.queries import QUERIES
    from bigquery_etl_fork_spark.session import get_spark

    cdc_only = "--cdc-only" in sys.argv
    # calibrate BEFORE the SparkSession exists: a live JVM's background
    # threads inflate the single-proc probe ~1.6-1.9x on an otherwise idle
    # host (measured), which would read as phantom "host load"
    cal_before = None if cdc_only else _calibrate()
    dedup_mode = os.environ.get("SPARK_GRAFT_DEDUP_MODE", "jvm")
    # SPARK_GRAFT_MASTER overrides for multi-JVM runs, e.g.
    # local-cluster[8,4,4096] (8 executor JVMs x 4 cores — the in-sandbox
    # stand-in for a real multi-executor cluster)
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        extra = {}
        if master.startswith("local-cluster"):
            extra = {
                "spark.executor.memory": os.environ.get("SPARK_GRAFT_EXEC_MEM", "3g"),
                "spark.memory.offHeap.size": os.environ.get("SPARK_GRAFT_OFFHEAP", "1g"),
            }
        spark = get_spark("bench", master=master, extra_conf=extra)
    else:
        spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    sf = _sf()
    # warm up JVM/codegen so timings measure the engine, not startup
    spark.range(1000).selectExpr("sum(id)").collect()

    n_epochs = int(os.environ.get("SPARK_GRAFT_BENCH_EPOCHS", "8"))
    cdc = run_cdc(spark, sf, dedup_mode=dedup_mode, n_epochs=n_epochs)
    if cdc_only:
        print(json.dumps({"cdc": cdc, "cpus": CPUS, "sf": sf}))
        return
    bulk = run_cdc(spark, sf, dedup_mode=dedup_mode, n_epochs=1)

    # min-of-N per query: the sandbox host's external load causes 2-10x
    # one-off spikes (a cube query once measured 10.4s vs its true ~1s);
    # the minimum is the engine's number
    repeat_q = int(os.environ.get("SPARK_GRAFT_QUERY_REPEAT", "2"))
    # min-of-N for EVERY query, including the expensive multi-job pipelines
    # (ADVICE r3: a single 2-10x host spike otherwise lands directly in the
    # official number with no second sample — spike immunity is worth the
    # ~30s of extra wall)
    qsecs: dict[str, float] = {"cdc_replay": cdc["seconds"]}
    for name, fn in QUERIES.items():
        if name == "cdc_replay":
            continue
        best = None
        for _ in range(repeat_q):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        qsecs[name] = round(best, 3)

    cal_after = _calibrate()
    # unloaded-host reference times for the calibration probes, pinned from
    # the best windows observed across rounds (BASELINE.md "host
    # calibration" section); load_factor ~1 = clean window, >>1 = loaded —
    # divide engine slowdowns by it before reading anything into them.
    # Load factors use the PRE-JVM probe only; `after_in_jvm` runs beside
    # the live (idle) JVM whose background threads inflate the single-proc
    # probe ~1.6-1.9x — it senses mid-run drift, not absolute load.
    ref = {"single_sec": 0.40, "par8_sec": 1.08}
    detail = {
        "bench_detail": True,
        "queries": qsecs,
        "host_calibration": {
            "before": cal_before,
            "after_in_jvm": cal_after,
            "reference_unloaded": ref,
        },
        "cdc": cdc,
        "cdc_bulk_catchup": bulk,
    }
    # The round driver keeps only the LAST ~2000 chars of stdout (VERDICT r4
    # #2: BENCH_r04 was `parsed: null` because the single fat JSON line
    # outgrew that tail and the capture started mid-line). So: full detail on
    # an EARLIER line + a side file, and the LAST printed line is a compact
    # headline guaranteed under 1800 bytes.
    print(json.dumps(detail))
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(side, "w") as fh:
        json.dump(detail, fh, indent=2)
    print(headline_line(qsecs, cdc, bulk, cal_before, ref, sf))


def headline_line(qsecs, cdc, bulk, cal_before, ref, sf) -> str:
    """Compact final-line JSON, guaranteed ≤1800 bytes (driver keeps only
    the last ~2000 chars of stdout; a longer line parses as null)."""
    out = {
        "metric": "cdc_events_applied_per_sec",
        "value": cdc["events_per_sec"],
        "unit": "events/sec",
        "queries": {k: round(v, 2) for k, v in qsecs.items()},
        "sf": sf,
        "cpus": CPUS,
        "host_calibration_sec": cal_before["single_sec"],
        "load_factor_single": round(cal_before["single_sec"] / ref["single_sec"], 2),
        "load_factor_par8": round(cal_before["par8_sec"] / ref["par8_sec"], 2),
        "cdc_drip_sec": cdc["seconds"],
        "cdc_bulk_sec": bulk["seconds"],
        "cdc_bulk_events_per_sec": bulk["events_per_sec"],
        "detail_file": "BENCH_DETAIL.json",
    }
    line = json.dumps(out)
    if len(line) > 1800:
        # first resort: 1-decimal query timings (saves ~1 byte/query while
        # keeping every per-query number on the official record)
        out["queries"] = {k: round(v, 1) for k, v in qsecs.items()}
        line = json.dumps(out)
    if len(line) > 1800:
        # last resort: per-query timings live in the detail line/file; the
        # headline must survive the driver's 2000-char stdout tail no
        # matter what
        out["queries"] = "see BENCH_DETAIL.json"
        line = json.dumps(out)
    return line


def scaling() -> None:
    """Run the same CDC replay at two parallelism levels in separate fresh
    processes — the in-sandbox evidence for the N→4N executor scaling
    criterion.

    Modes (SPARK_GRAFT_SCALING_MODE):
      - "cluster" (default): levels are EXECUTOR counts; each level runs
        under ``local-cluster[N,4,4096]`` — N separate executor JVMs with
        4 cores each, the closest in-sandbox stand-in for a real
        multi-executor cluster (no shared heap / GC between executors).
        2,8 ⇒ the N→4N pair (8 vs 32 cores).
      - "local": levels are thread counts of a single local[N] JVM.

    The sandbox host carries noisy external load (observed 2× swings on
    identical runs), so each level runs `SPARK_GRAFT_SCALING_REPEATS` times
    in ALTERNATING order and the per-level minimum is reported.
    """
    mode = os.environ.get("SPARK_GRAFT_SCALING_MODE", "cluster")
    default_levels = "2,8" if mode == "cluster" else "8,32"
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", default_levels).split(",")
    ]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    cores_per_exec = int(os.environ.get("SPARK_GRAFT_CORES_PER_EXEC", "4"))
    runs: dict[int, list[float]] = {lv: [] for lv in levels}
    details: dict[int, dict] = {}
    for _ in range(repeats):
        for lv in levels:
            # >=2 in-process runs per child: the first replay in a fresh JVM
            # pays C2-compile warmup that would otherwise masquerade as
            # engine time (flattering neither level, but distorting ratios)
            env = dict(
                os.environ,
                SPARK_GRAFT_SF_DIR=SF_DIR,
                SPARK_GRAFT_BENCH_REPEAT=os.environ.get("SPARK_GRAFT_SCALING_INNER", "2"),
            )
            if mode == "cluster":
                env["SPARK_GRAFT_MASTER"] = f"local-cluster[{lv},{cores_per_exec},4096]"
                env["SPARK_GRAFT_CPUS"] = str(lv * cores_per_exec)
            else:
                env["SPARK_GRAFT_CPUS"] = str(lv)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cdc-only"],
                env=env,
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
            cdc = json.loads(line)["cdc"]
            runs[lv].append(cdc["seconds"])
            details[lv] = cdc
    lo, hi = levels[0], levels[-1]
    best = {lv: min(rs) for lv, rs in runs.items()}
    events = details[hi]["events"]
    tp = {lv: round(events / best[lv], 1) for lv in levels}
    eff = (tp[hi] / tp[lo]) / (hi / lo)
    unit = "executors" if mode == "cluster" else "cores"
    report = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}_{unit}",
        "value": round(eff, 3),
        "mode": mode,
        f"throughput_{lo}{unit}": tp[lo],
        f"throughput_{hi}{unit}": tp[hi],
        "cores_per_executor": cores_per_exec if mode == "cluster" else None,
        "all_runs_sec": {str(k): v for k, v in runs.items()},
        "events": events,
        "sf": _sf(),
        "workload": {k: details[hi][k] for k in ("dedup_mode", "num_buckets", "n_docs")},
    }
    print(json.dumps(report))
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALING.json"), "w"
    ) as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
