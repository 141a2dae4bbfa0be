#!/usr/bin/env python3
"""Two-run hash-stability gate.

Usage: python3 tools/stability.py <verifyOutDirA> <verifyOutDirB> [jsonOut]

The driver's correctness gate hashes ONE Verify run against the DuckDB
oracle; a query whose output is nondeterministic (partition-order float
summation, unstable ties, time-dependent values) can flap between green
and red across rounds without any code change. This gate runs the same
canonicalization as tools/compare.py over TWO independent Verify runs
(separate JVMs) and fails any query whose canonical content hash
differs between them — converting "hash flap" from a diagnosis into a
gate signal.

Floats are hashed via float.hex() (bit-exact, no repr rounding); other
values via repr. Writes a per-query JSON artifact when jsonOut is given.
"""
import sys, json, glob, hashlib
import pandas as pd


def canon_hash(qdir: str):
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        return None, 0
    df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    h = hashlib.sha256()
    h.update(("|".join(df.columns) + "\n").encode())
    for row in df.itertuples(index=False, name=None):
        for v in row:
            if isinstance(v, float):
                h.update(b"nan" if v != v else v.hex().encode())
            else:
                h.update(repr(v).encode())
            h.update(b"\x1f")
        h.update(b"\n")
    return h.hexdigest(), len(df)


def main(dir_a, dir_b, json_out=None):
    names = sorted({d.split("/")[-1] for d in glob.glob(f"{dir_a}/q*")}
                   | {d.split("/")[-1] for d in glob.glob(f"{dir_b}/q*")})
    if not names:
        # a typo'd path must not read as a green gate
        print(f"ERROR: no q* outputs under {dir_a} or {dir_b}")
        return 2
    report, n_fail = {}, 0
    for name in names:
        ha, ra = canon_hash(f"{dir_a}/{name}")
        hb, rb = canon_hash(f"{dir_b}/{name}")
        stable = ha is not None and ha == hb
        report[name] = {"stable": stable, "rows": ra,
                        "hash_a": ha, "hash_b": hb}
        if stable:
            print(f"STABLE   {name}: {ra} rows, {ha[:16]}")
        else:
            n_fail += 1
            print(f"UNSTABLE {name}: run A {ra} rows {ha and ha[:16]}, "
                  f"run B {rb} rows {hb and hb[:16]}")
    print(f"\n== {len(names) - n_fail} stable, {n_fail} unstable ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
