#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for every
<outDir>/<name> parquet dir with an entry in oracle_sql.json, runs the
oracle SQL in DuckDB (tables = parquet files in sfDir) and compares
values with columns sorted by name and rows sorted by all columns.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got_files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in got_files]) if got_files else pd.DataFrame()
        if name not in oracles:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(got)}")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"  ✗ {name}: COLUMN MISMATCH spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"  ✗ {name}: ROWCOUNT spark={len(g)} duck={len(w)}")
            n_fail += 1
            continue
        try:
            eq = g.equals(w)
            if not eq:
                # tolerate dtype-level diffs, compare as strings
                eq = g.astype(str).equals(w.astype(str))
        except Exception:
            eq = False
        if eq:
            print(f"  ✓ {name}: rows={len(g)}")
            n_pass += 1
        else:
            print(f"  ✗ {name}: VALUE MISMATCH rows={len(g)}")
            diff = (g.astype(str) != w.astype(str))
            bad = diff.any(axis=1)
            print("    spark:", g[bad].head(3).to_dict("records"))
            print("    duck :", w[bad].head(3).to_dict("records"))
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
