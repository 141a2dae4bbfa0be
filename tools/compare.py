#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [jsonOut]

For each query dir under verifyOutDir: load the Spark parquet result,
run the matching oracle_sql.json entry in DuckDB against the sfDir
tables, sort columns by name and rows by all columns, compare values
(exact for non-floats, tiny tolerance report for floats).

When jsonOut is given, writes a self-defending per-query artifact
(r16 verdict #1: the round-16 driver CORRECTNESS artifact arrived as
an empty {} and nothing recorded the real gate result) — status per
query plus the gate-environment stamp, committed as
CORRECTNESS_LOCAL_r{N}.json at round close. tools/tripwire.py checks
the driver's artifact against it.
"""
import sys, json, glob, math, os, time
import duckdb
import pandas as pd

# Per-oracle wall-time budget (seconds). The r17 gate blocker was an
# oracle (q327) that DuckDB planned as a ~40-minute/90 GB IEJoin — it
# merged with nothing flagging it, and the official driver artifact
# went dark for two rounds. Any oracle over this budget now FAILS the
# gate even when values match. Override with ORACLE_BUDGET_SEC
# (0 disables).
ORACLE_BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "60"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, json_out=None):
    # Gate-environment stamp (r7 q71/q72 were DuckDB-version divergence;
    # record what compared so "passes locally, fails on driver" is
    # diagnosable). Merges the engine-side stamp Verify wrote, if any.
    env = {"duckdb_version": duckdb.__version__,
           "pandas_version": pd.__version__}
    try:
        env.update(json.load(open(f"{out_dir}/gateenv.json")))
    except Exception:
        pass
    print("gate env: " + ", ".join(f"{k}={v}" for k, v in sorted(env.items())))
    try:
        with open("GATEENV.json", "w") as f:
            json.dump(env, f, indent=1, sort_keys=True)
    except Exception:
        pass
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    statuses = {}
    oracle_secs = {}
    over_budget = []
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.split("/")[-1]
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")],
                                 ignore_index=True)
        except ValueError:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            statuses[name] = "fail: no spark output"; continue
        if name not in oracle:
            print(f"rows-only {name}: {len(spark_df)} rows"); n_rowsonly += 1
            statuses[name] = f"rows-only: {len(spark_df)} rows"; continue
        try:
            t0 = time.monotonic()
            oracle_df = con.execute(oracle[name]).df()
            oracle_secs[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            oracle_secs[name] = round(time.monotonic() - t0, 3)
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            statuses[name] = f"fail: oracle SQL error: {e}"; continue
        if ORACLE_BUDGET_SEC and oracle_secs[name] > ORACLE_BUDGET_SEC:
            over_budget.append((name, oracle_secs[name]))
        s, o = canon(spark_df.copy()), canon(oracle_df.copy())
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_fail += 1
            statuses[name] = f"fail: columns {list(s.columns)} vs {list(o.columns)}"; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1
            statuses[name] = f"fail: rows {len(s)} vs {len(o)}"; continue
        bad = []
        dtype_bad = []
        for c in s.columns:
            a, b = s[c], o[c]
            # Driver-faithful dtype gate: the driver hashes RENDERED
            # values, so int64 3 vs float64 3.0 ("3" vs "3.0") is a
            # hash mismatch even when numerically equal. The r7-r9
            # q71/q72/q83/q84/q91 reds were exactly this — DuckDB
            # sum(BIGINT) returns HUGEINT, which pandas renders as
            # float64. Casting both sides to float here (as the old
            # compare did unconditionally) hides that divergence.
            a_num = pd.api.types.is_numeric_dtype(a)
            b_num = pd.api.types.is_numeric_dtype(b)
            if a_num and b_num and \
               (pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b)
                or pd.api.types.is_bool_dtype(a) != pd.api.types.is_bool_dtype(b)):
                # bool-vs-int matters too: True == 1 passes a value
                # compare but renders "true" vs "1" under the driver
                dtype_bad.append((c, str(a.dtype), str(b.dtype)))
                continue
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                # Bitwise compare, mirroring the driver's value-hash gate:
                # float == would pass -0.0 vs 0.0 (and would need NaN
                # special-casing), but the driver hashes rendered values,
                # so signed zeros and NaNs must match bit-for-bit.
                import numpy as np
                aa = a.astype(float).to_numpy()
                bb = b.astype(float).to_numpy()
                eq = aa.view(np.uint64) == bb.view(np.uint64)
                exact_bad = int((~eq).sum())
                if exact_bad:
                    diff = np.abs(aa - bb)
                    mx = float(np.nanmax(diff[~eq]))
                    bad.append((c, exact_bad, mx))
            else:
                av = a.where(pd.notna(a), None)
                bv = b.where(pd.notna(b), None)
                ne = sum(1 for x, y in zip(av, bv) if x != y and not (x is None and y is None))
                if ne:
                    bad.append((c, ne, None))
        if dtype_bad:
            msgs = ", ".join(f"{c}: spark {sd} vs oracle {od} (renders e.g. 3 vs 3.0)"
                             for c, sd, od in dtype_bad)
            print(f"FAIL {name}: dtype mismatch — {msgs}")
            n_fail += 1
            statuses[name] = f"fail: dtype mismatch — {msgs}"
        elif bad:
            msgs = ", ".join(f"{c}: {n} diffs" + (f" (max abs {m:.3g})" if m is not None else "")
                             for c, n, m in bad)
            print(f"FAIL {name}: {len(s)} rows; {msgs}")
            n_fail += 1
            statuses[name] = f"fail: {msgs}"
        else:
            slow = f" [oracle {oracle_secs[name]:.1f}s]" if oracle_secs[name] > 5 else ""
            print(f"PASS {name}: {len(s)} rows, {len(s.columns)} cols (exact){slow}")
            n_pass += 1
            statuses[name] = f"pass: {len(s)} rows (exact)"
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    if over_budget:
        for name, sec in sorted(over_budget, key=lambda x: -x[1]):
            print(f"ORACLE BUDGET EXCEEDED {name}: {sec:.1f}s > "
                  f"{ORACLE_BUDGET_SEC:.0f}s — a gate this slow blinds the "
                  "driver's correctness artifact (r17 q327); restructure the "
                  "oracle SQL (equi-join-first, no inequality ON conditions)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_rowsonly, "n_queries": len(statuses),
                       "oracle_budget_sec": ORACLE_BUDGET_SEC,
                       "n_over_budget": len(over_budget),
                       "oracle_sec": oracle_secs,
                       "gate_env": env, "queries": statuses},
                      f, indent=1, sort_keys=True)
    return 1 if (n_fail or over_budget) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
