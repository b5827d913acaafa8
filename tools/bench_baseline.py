#!/usr/bin/env python3
"""Combine N cold-session graft.Bench artifacts into BENCH_BASELINE.json.

Usage: python3 tools/bench_baseline.py session1.json session2.json [...]

Each input is a BENCH_LATEST.json written by graft.Bench (reprobe-median
estimator). The baseline takes the per-query MEDIAN across sessions (a
query failed in any session -> -1), so one contended session cannot skew
the committed reference. Future rounds diff BENCH_r{N}.json against this
file instead of against the previous round's possibly-noisy artifact
(r9 verdict item 3: r8->r9 totals were not like-for-like).
"""
import json
import statistics
import sys
from pathlib import Path

def main() -> None:
    paths = [Path(p) for p in sys.argv[1:]]
    if len(paths) < 2:
        sys.exit("need at least 2 session artifacts")
    sessions = [json.loads(p.read_text()) for p in paths]
    names = list(sessions[0]["queries"].keys())
    for s in sessions:
        if list(s["queries"].keys()) != names:
            sys.exit("sessions ran different query lists; re-run")
    queries = {}
    for n in names:
        vals = [s["queries"][n] for s in sessions]
        queries[n] = -1.0 if any(v < 0 for v in vals) else round(statistics.median(vals), 3)
    ok = [v for v in queries.values() if v >= 0]
    # The anchor carries its epoch's calibration-probe seconds so future
    # Bench runs self-adjudicate: epoch_ratio = session probe / anchor
    # probe divides uniform host drift out of every per-query ratio
    # (r11 verdict item 3 — three rounds of manual epoch arithmetic).
    probes = [s["probe_sec"] for s in sessions if s.get("probe_sec", -1) > 0]
    out = {
        "metric": "total",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "sf": sessions[0]["sf"],
        "estimator": "median across cold sessions of per-query reprobe medians",
        "n_sessions": len(sessions),
        "session_totals": [s["value"] for s in sessions],
        "stall_suspect_sessions": [s.get("stall_suspect") for s in sessions],
        "probe_sec": round(statistics.median(probes), 3) if probes else -1.0,
        "session_probes": [s.get("probe_sec", -1.0) for s in sessions],
        "queries": queries,
    }
    Path("BENCH_BASELINE.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"BENCH_BASELINE.json: total={out['value']}s over {len(names)} queries, "
          f"{len(sessions)} sessions {out['session_totals']}")

if __name__ == "__main__":
    main()
