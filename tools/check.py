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

def render_class(dtype) -> str:
    """How the driver's hash renders values of this dtype. int64 and
    int32 render identically ("11853"); float64 renders "11853.0" —
    so an int-vs-float pair hashes red even when numerically equal
    (the DuckDB HUGEINT trap: SUM(BIGINT) -> HUGEINT -> float64)."""
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return f"float{dtype.itemsize * 8}"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"

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
        # oracle-type audit: HUGEINT anywhere is a latent driver
        # failure (surfaces as float64 in pandas) — name the cause.
        try:
            desc = con.execute(f"DESCRIBE {sql}").df()
            huge = [r["column_name"] for _, r in desc.iterrows()
                    if "HUGEINT" in str(r["column_type"])]
        except Exception:
            huge = []
        if huge:
            print(f"FAIL {name}: oracle HUGEINT cols {huge} (add ::BIGINT)")
            failures += 1; continue
        # dtype-strict: the driver hashes raw rendered values, so a
        # float64-vs-int64 pair fails there even when numerically
        # equal. NO coercion before compare — mirror the driver.
        badtype = [(c, str(got[c].dtype), str(exp[c].dtype))
                   for c in got.columns
                   if render_class(got[c].dtype) != render_class(exp[c].dtype)]
        if badtype:
            c, ga, ea = badtype[0]
            print(f"FAIL {name}: dtype col {c}: spark={ga} duckdb={ea}")
            failures += 1; continue
        mismatch = None
        for c in got.columns:
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
