#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only —
the shipped library is pure Scala/Spark).

Usage: python3 tools/check.py [sfDir] [outDir]
  1. (caller) run `sbt "runMain graft.Verify <sfDir> <outDir>"` first
  2. this script registers the sfDir parquet tables in DuckDB, runs
     each oracle_sql.json query, and compares against outDir/<name>/
     parquet with columns sorted by name and rows sorted by all cols.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no verify output"); failures += 1; continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            failures += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); failures += 1; continue
        # exact value compare (the driver hashes values)
        mismatch = None
        for c in got.columns:
            try:
                b = exp[c].astype(got[c].dtype)
            except (TypeError, ValueError):
                b = exp[c]
            a = got[c]
            try:
                eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i]); break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duckdb={bv!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"\n{len(oracles)-failures}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
