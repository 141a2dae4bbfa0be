#!/usr/bin/env python3
"""Project the driver's per-round wall cost from this round's artifacts.

Usage: python3 tools/project_driver_cost.py <CORRECTNESS_LOCAL.json> <BENCH_LOCAL.json>

r18 post-mortem: the driver's bench window killed the run (rc=124,
parsed:null) because the suite grew 353->358 queries x 3 repeats and
nothing tracked the projection toward the window. This script is the
dashboard: it sums the committed oracle timings (the DuckDB gate), the
bench medians x repeats plus stage builds, and a fixed allowance for
Verify itself, then WARNS when the projection crosses the budget (exit
1 so round_close surfaces it for adjudication; the budget is a soft
driver-window estimate, not a measured constant).

Writes `projected_driver_sec` into the correctness artifact in place so
the projection is part of the committed round record.
"""
import json, os, sys

# Soft estimate of the driver's per-phase window. The r18 driver bench
# died somewhere under ~40 min on a loaded box; warn well before that.
BUDGET_SEC = float(os.environ.get("DRIVER_WINDOW_BUDGET_SEC", "1500"))
# Loaded driver boxes have measured 2-5x local timings (BENCH_r18 tail);
# project with a middling contention factor rather than quiet-box truth.
CONTENTION = float(os.environ.get("DRIVER_CONTENTION_FACTOR", "2.0"))
# Verify itself (Spark session + 358 parquet writes at sf0.01) is not
# timed per-query in any artifact; allow a flat floor for it.
VERIFY_FLOOR_SEC = 300.0


def main(corr_path, bench_path):
    corr = json.load(open(corr_path))
    bench = json.load(open(bench_path))
    oracle_sec = sum(corr.get("oracle_sec", {}).values())
    repeats = bench.get("repeats", 3)
    queries = bench.get("queries", {})
    audit = queries.get("q40_accuracy_audit", 0.0)
    # Bench r19+ runs the q40 audit once, not per repeat.
    bench_sec = (sum(queries.values()) - audit) * repeats + audit \
        + bench.get("stage_build_sec", 0.0)
    projected = CONTENTION * (oracle_sec + bench_sec) + VERIFY_FLOOR_SEC
    report = {
        "projected_driver_sec": round(projected, 1),
        "budget_sec": BUDGET_SEC,
        "contention_factor": CONTENTION,
        "oracle_sec_total": round(oracle_sec, 1),
        "bench_sec_projected": round(bench_sec, 1),
        "verify_floor_sec": VERIFY_FLOOR_SEC,
        "n_queries": len(queries),
    }
    corr["projected_driver_sec"] = report
    with open(corr_path, "w") as f:
        json.dump(corr, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    if projected > BUDGET_SEC:
        print(f"DRIVER WINDOW WARNING: projected {projected:.0f}s > "
              f"budget {BUDGET_SEC:.0f}s — the suite has outgrown the "
              "driver window (r18 failure mode); trim repeats, split "
              "stage builds, or speed up the slowest queries/oracles")
        return 1
    print(f"driver-window projection OK: {projected:.0f}s <= {BUDGET_SEC:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
