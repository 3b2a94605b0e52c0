#!/usr/bin/env python
"""Host scaling-envelope probe — the control experiment for BENCH_SCALING.

Measures how well THIS HOST scales embarrassingly-parallel, memory-bound
work (the resource profile of a shuffle-heavy data engine) across process
counts, with no Spark/JVM involved: N independent processes each stream a
private 256 MiB float64 buffer through numpy sums, barrier-synchronized
start, wall-clock over the slowest.

An engine measured on this host cannot scale better than this envelope —
single-socket memory bandwidth saturates well below 32 cores. Report the
engine's N→4N efficiency alongside the envelope's at the same core counts;
efficiency_engine / efficiency_envelope ≈ how much of the achievable
scaling the engine captures (the number a real multi-node cluster, where
each executor brings its own memory system, would not be capped by).

Usage: python scripts/envelope_probe.py [levels, default "2,8,32"]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BYTES = 256 * 1024 * 1024
PASSES = 8


def _worker(barrier, out, i):
    a = np.random.default_rng(i).random(BYTES // 8)
    barrier.wait()
    t0 = time.time()
    s = 0.0
    for _ in range(PASSES):
        s += float(a.sum())
    out[i] = time.time() - t0
    if s == -1:  # keep the sum live
        print(s)


def measure(n_procs: int) -> float:
    """GB/s aggregated across n_procs barrier-synced streaming processes."""
    barrier = mp.Barrier(n_procs)
    out = mp.Array("d", n_procs)
    procs = [mp.Process(target=_worker, args=(barrier, out, i)) for i in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = max(out[:])
    total_bytes = n_procs * PASSES * BYTES
    return total_bytes / wall / 1e9


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8,32").split(",")]
    best = {lv: 0.0 for lv in levels}
    for _ in range(3):  # best-of-3 per level, alternating (host noise)
        for lv in levels:
            best[lv] = max(best[lv], measure(lv))
    effs = {}
    for lo in levels:
        for hi in levels:
            if hi > lo:
                effs[f"eff_{lo}_to_{hi}"] = round((best[hi] / best[lo]) / (hi / lo), 3)
    print(
        json.dumps(
            {
                "metric": "host_memory_envelope_gbps",
                "gbps": {str(k): round(v, 1) for k, v in best.items()},
                **effs,
                "buffer_mib": BYTES // (1024 * 1024),
                "passes": PASSES,
            }
        )
    )


if __name__ == "__main__":
    main()
