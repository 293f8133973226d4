#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each query's parquet dump (written by graft.Verify) and compares it
against DuckDB running the oracle SQL from oracle_sql.json on the same
testdata parquet tables: column name sets, dtypes, row counts, and values
after sorting columns by name and rows by all columns.

Usage: check_oracles.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet");  n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

def canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)

def compare(got, want):
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return False, f"row count {len(got)} vs {len(want)}"
    g, w = canon(got), canon(want)
    for c in g.columns:
        if str(g[c].dtype) != str(w[c].dtype):
            return False, f"dtype[{c}] {g[c].dtype} vs {w[c].dtype}"
        gc, wc = g[c], w[c]
        if gc.dtype == object:
            neq = ~((gc == wc) | (gc.isna() & wc.isna()))
        else:
            neq = ~((gc == wc) | (gc.isna() & wc.isna()))
        if neq.any():
            i = neq.idxmax()
            detail = f"first diff row {i}: {gc[i]!r} vs {wc[i]!r}"
            if str(gc.dtype).startswith("float"):
                import numpy as np
                d = (gc - wc).abs().max()
                detail += f" (max abs diff {d})"
            return False, f"values[{c}] differ: {detail}"
    return True, ""

if __name__ == "__main__":
    main()
