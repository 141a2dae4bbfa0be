#!/usr/bin/env python3
"""Cross-round scale-probe drift tripwire (r16 verdict #4).

Usage: python3 tools/scale_diff.py <currentScale.json> <previousScale.json> [jsonOut]

SCALE_r{N}.json is a file of JSON lines: one optional header line
(`{"header":"scale","load_before":...,"repeats":...}`) followed by one
line per probe. Since r17 each timed probe carries two independent
samples (`"sec_runs":[a,b]`) and reports `"sec"` as their MIN — the
quiet estimate, because contention inflates wall time but never
deflates it. Earlier rounds carry a single-sample `"sec"`.

This tool compares per-probe `sec` between two artifacts and flags
drift beyond 2x in either direction. The quiet-min discriminator: a
probe whose current samples spread more than 2x between themselves
(`max(sec_runs)/min(sec_runs) > 2`) was measured on a loaded box — its
drift flag is labeled `noisy_sample` instead of `regressed`, exactly
the adjudication the r16 verdict had to decline for line_dedup /
data_card / ann_batch_topk / gopher_rules (single-vintage single-shot,
no way to tell variance from regression).

Shape probes (candidate counts, no `sec`) are compared on their
`sub_quadratic` flag only.

Exit code: 0 when no probe regressed >2x with quiet samples, 1
otherwise; new/removed probes are reported, never fatal.
"""
import sys, json


def load(path):
    header, probes = {}, {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("header") == "scale":
                header = d
            elif "probe" in d:
                probes[d["probe"]] = d
    return header, probes


def main(cur_path, prev_path, out_path=None):
    cur_h, cur = load(cur_path)
    prev_h, prev = load(prev_path)
    report = {
        "current": cur_path, "previous": prev_path,
        "current_load_before": cur_h.get("load_before"),
        "previous_load_before": prev_h.get("load_before"),
        "regressed": [], "noisy_sample": [], "improved": [],
        "added": [], "removed": [], "shape_flips": [],
    }
    for name in sorted(set(cur) | set(prev)):
        c, p = cur.get(name), prev.get(name)
        if c is None:
            report["removed"].append(name)
            continue
        if p is None:
            report["added"].append(name)
            continue
        if "sub_quadratic" in c or "sub_quadratic" in p:
            if c.get("sub_quadratic") != p.get("sub_quadratic"):
                report["shape_flips"].append({
                    "probe": name, "current": c.get("sub_quadratic"),
                    "previous": p.get("sub_quadratic")})
            continue
        cs, ps = c.get("sec"), p.get("sec")
        if cs is None or ps is None or ps == 0:
            continue
        ratio = cs / ps
        runs = c.get("sec_runs") or []
        noisy = bool(runs) and min(runs) > 0 and max(runs) / min(runs) > 2
        entry = {"probe": name, "sec": cs, "prev_sec": ps,
                 "ratio": round(ratio, 2), "sec_runs": runs}
        if ratio > 2:
            report["noisy_sample" if noisy else "regressed"].append(entry)
        elif ratio < 0.5:
            report["improved"].append(entry)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    return 1 if report["regressed"] or report["shape_flips"] else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
