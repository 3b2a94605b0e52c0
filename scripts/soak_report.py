"""Summarize a supervised soak log (scripts/soak_supervisor.sh output)
into the numbers BASELINE.md records: per-process replay walls, epoch
latency band, vacuum stats, resume points, and end-to-end throughput.

Pure-Python post-processing — safe to run while the soak is in flight
(prints the partial picture so far).

Usage: python scripts/soak_report.py /tmp/soak_1e10.log
"""

import json
import re
import sys


def parse(path: str) -> dict:
    epochs, vacs, procs, resumes, attempts = [], [], [], [], 0
    probe = cal = None
    gen_sec = None
    # progress bars write \r-separated junk around the JSON lines; a JSON
    # object is always the last thing on its (possibly \r-glued) line
    rx = re.compile(r"\{[^{}]*(?:\{[^{}]*\}[^{}]*)*\}")
    with open(path, errors="replace") as fh:
        for raw in fh:
            for piece in raw.replace("\r", "\n").splitlines():
                m = rx.search(piece)
                if not m:
                    continue
                try:
                    d = json.loads(m.group(0))
                except json.JSONDecodeError:
                    continue
                # "probe" first: the final probe object also carries a
                # resumed_at_watermark key and must not be classified as
                # a plain resume line
                if "probe" in d:
                    probe = d
                elif "epoch" in d:
                    epochs.append(d)
                    if "vac_sec" in d:
                        vacs.append(d)
                elif "proc_exit" in d:
                    procs.append(d)
                elif "resumed_at_watermark" in d:
                    resumes.append(d["resumed_at_watermark"])
                elif "supervisor_attempt" in d:
                    attempts = max(attempts, d["supervisor_attempt"])
                elif "cal_before" in d and cal is None:
                    cal = d["cal_before"]
                elif "gen_sec" in d:
                    gen_sec = d["gen_sec"]
    lat = [e["latency_s"] for e in epochs]
    # total replay wall = per-proc walls (each proc's 'elapsed' restarts at 0)
    walls = [p["proc_replay_sec"] for p in procs]
    if probe:
        walls.append(probe["seconds"])
    elif epochs:
        walls.append(epochs[-1]["elapsed"])  # in-flight tail proc
    out = {
        "epochs_applied": len(epochs),
        "gen_sec": gen_sec,
        "first_calibration": cal,
        "supervisor_attempts": attempts,
        "resume_watermarks": resumes,
        "epoch_latency_min": min(lat) if lat else None,
        "epoch_latency_max": max(lat) if lat else None,
        "epoch_latency_median": sorted(lat)[len(lat) // 2] if lat else None,
        "replay_wall_total_sec": round(sum(walls), 1),
        # crash-robust wall proxy: a proc killed mid-run leaves no
        # proc_exit line, so its wall vanishes from replay_wall_total_sec;
        # the sum of committed epochs' apply latencies survives any kill
        # pattern (add vacuum_sec_total for the full in-loop wall)
        "sum_epoch_latency_sec": round(sum(lat), 1),
        "vacuums": len(vacs),
        "vacuum_sec_total": round(sum(v["vac_sec"] for v in vacs), 1),
        "tbl_gb_last": vacs[-1]["tbl_gb"] if vacs else None,
        "local_free_gb_min": min(e["local_free_gb"] for e in epochs)
        if epochs else None,
        "probe": probe,
    }
    if lat:
        firsts = {0}
        acc = 0
        for p in procs:
            acc += p["epochs_applied_this_proc"]
            firsts.add(acc)
        steady = [v for i, v in enumerate(lat) if i not in firsts]
        if steady:
            out["steady_latency_band"] = [min(steady), max(steady)]
    if probe is None and epochs:
        out["note"] = "soak still in flight — partial picture"
    return out


if __name__ == "__main__":
    print(json.dumps(parse(sys.argv[1] if len(sys.argv) > 1
                           else "/tmp/soak_1e10.log"), indent=2))
