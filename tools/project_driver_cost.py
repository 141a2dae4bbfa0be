#!/usr/bin/env python3
"""Project the driver's per-round wall cost from this round's artifacts.

Usage: python3 tools/project_driver_cost.py <CORRECTNESS_LOCAL.json> <BENCH_LOCAL.json>

r18 post-mortem: the driver's bench window killed the run (rc=124,
parsed:null) because the suite grew 353->358 queries x 3 repeats and
nothing tracked the projection toward the window. This script is the
dashboard: it projects what the driver pays per round —

  - the DuckDB gate (sum of committed per-oracle timings),
  - the bench (medians x repeats + stage builds, inflated by a
    contention factor for the loaded-driver reality, then CAPPED at
    Bench's own wall budget, because since r19 Bench degrades repeats
    instead of overrunning),
  - a flat allowance for Verify itself,

and warns (exit 1, for round_close to surface) when the projection
crosses the soft window estimate. The projection is also written into
the correctness artifact as `projected_driver_sec`, so round-over-round
growth is a committed trend, not a surprise.
"""
import json, os, sys

# Soft estimate of the driver's per-round window. The r17 driver bench
# completed at ~635 s and the r18 one was killed on a loaded box; with
# Bench self-capping at its wall budget the projection is bounded by
# construction — the warn exists to catch GATE/VERIFY growth and any
# future un-capped phase.
BUDGET_SEC = float(os.environ.get("DRIVER_WINDOW_BUDGET_SEC", "4000"))
# Loaded driver boxes have measured 2-5x local timings (BENCH_r18 tail);
# project with a middling contention factor rather than quiet-box truth.
CONTENTION = float(os.environ.get("DRIVER_CONTENTION_FACTOR", "2.0"))
# Bench degrades repeats past this wall budget (Bench.scala default).
BENCH_WALL = float(os.environ.get("SPARK_GRAFT_BENCH_WALL_BUDGET", "3000"))
# Verify itself (Spark session + ~360 parquet writes at sf0.01) is not
# timed per-query in any artifact; allow a flat floor for it.
VERIFY_FLOOR_SEC = 300.0


def simulate_bench(queries, repeats, wall, factor):
    """Walk the suite in Bench's own (sorted-name) order, applying its
    degrade ladder (past 60% of the wall budget: 2 repeats, past 80%:
    1) to contention-inflated per-query medians. This models what a
    loaded driver box actually pays: Bench does NOT hard-stop at the
    wall — it degrades to 1 repeat and still runs every remaining
    query, so a flat min(. , wall) cap (the pre-r20 formula) hid the
    whole 1-repeat tail AND, because wall < window budget, made bench
    growth unable to ever trip the warning (r19 ADVICE, medium)."""
    t = 0.0
    for name in sorted(queries):
        if name == "q40_accuracy_audit":
            eff = 1
        elif wall > 0 and t > wall * 0.8:
            eff = 1
        elif wall > 0 and t > wall * 0.6:
            eff = min(repeats, 2)
        else:
            eff = repeats
        t += queries[name] * factor * eff
    return t


def main(corr_path, bench_path):
    corr = json.load(open(corr_path))
    bench = json.load(open(bench_path))
    oracle_sec = sum(corr.get("oracle_sec", {}).values())
    repeats = bench.get("repeats", 3)
    queries = bench.get("queries", {})
    audit = queries.get("q40_accuracy_audit", 0.0)
    bench_quiet = (sum(queries.values()) - audit) * repeats + audit \
        + bench.get("stage_build_sec", 0.0)
    # stage builds run BEFORE Bench's wall clock starts, so they ride
    # outside the degrade ladder but inside the driver's window
    bench_proj = simulate_bench(queries, repeats, BENCH_WALL, CONTENTION) \
        + CONTENTION * bench.get("stage_build_sec", 0.0)
    projected = CONTENTION * oracle_sec + bench_proj + VERIFY_FLOOR_SEC
    report = {
        "projected_driver_sec": round(projected, 1),
        "budget_sec": BUDGET_SEC,
        "contention_factor": CONTENTION,
        "oracle_sec_total": round(oracle_sec, 1),
        "bench_sec_quiet": round(bench_quiet, 1),
        "bench_sec_projected": round(bench_proj, 1),
        "bench_wall_budget_sec": BENCH_WALL,
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
