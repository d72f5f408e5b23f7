#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs graft.Verify at a given SF dir, then replays each oracle SQL in
DuckDB over the same parquet tables and compares against the engine's
parquet output: columns sorted by name, rows sorted, exact values.

Usage: python3 scripts/verify_local.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, subprocess, sys, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
skip = "--skip-verify" in sys.argv

if not skip:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", env=env, capture_output=True, text=True)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
    if r.returncode != 0:
        print("VERIFY RUN FAILED:\n", tail)
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
import pandas as pd

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and \
           not str(df[c].dtype).startswith("datetime64[ns]"):
            df[c] = df[c].astype("datetime64[ns]")
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("u"):  # uint -> int
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

n_pass = n_fail = 0
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no engine output");  n_fail += 1;  continue
    try:
        mine = canon(pd.read_parquet(res_dir))
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}");  n_fail += 1;  continue
    if list(mine.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(want.columns)}")
        n_fail += 1;  continue
    if len(mine) != len(want):
        print(f"FAIL {name}: rows {len(mine)} vs {len(want)}")
        n_fail += 1;  continue
    if mine.equals(want):
        print(f"PASS {name} ({len(mine)} rows)");  n_pass += 1
    else:
        neq = (mine != want) & ~(mine.isna() & want.isna())
        bad = neq.any(axis=1)
        print(f"FAIL {name}: {int(bad.sum())}/{len(mine)} rows differ")
        print("  mine:", mine[bad].head(3).to_dict("records"))
        print("  want:", want[bad].head(3).to_dict("records"))
        n_fail += 1

# rows-only queries (no oracle): check output exists and rows > 0
for res_dir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(res_dir.rstrip("/"))
    if name in oracle:
        continue
    try:
        n = len(pd.read_parquet(res_dir))
        print(f"ROWS {name}: {n} rows{' (EMPTY!)' if n == 0 else ''}")
    except Exception as e:
        print(f"ROWS {name}: unreadable: {e}")

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
