#!/usr/bin/env python3
"""Execute the corpus_interleave_delta SQL twin's REFUSAL path (dev
tool only — the shipped library is pure Scala/Spark).

ExportSpec pins the Scala builder's refusal and the SQL twin's error
MESSAGE by string containment, but DuckDB itself never runs the
refusal branch in the normal oracle flow (a clean corpus has no novel
source, so the UNION ALL guard branch produces zero rows). This
script closes that gap (ADVICE r16): it doctors a corpus with a
novel-source doc in the delta half, runs the twin in DuckDB, and
asserts the query THROWS naming the source — proving the row-driven
`error()` guard actually fires instead of being optimized away.

Usage: python3 tools/oracle_refusal_check.py [sfDir] [oracleJson]
  oracleJson defaults to /tmp/verify_out/oracle_sql.json (a prior
  `sbt "runMain graft.Verify <sfDir> /tmp/verify_out"` dump).
"""
import json, sys
import duckdb

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    oracles = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    sql = json.load(open(oracles))["corpus_interleave_delta"]
    con = duckdb.connect()

    # sanity: the clean corpus must NOT trip the guard
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    n = len(con.execute(sql).fetchall())
    assert n > 0, "clean corpus should interleave"
    con.execute("DROP VIEW documents")

    # doctored corpus: one novel-source doc above the delta cutoff
    con.execute(
        f"""CREATE VIEW documents AS
            SELECT * FROM '{sf}/documents.parquet'
            UNION ALL
            SELECT (SELECT MAX(doc_id) * 2 + 1 FROM '{sf}/documents.parquet'),
                   'novel-source-doc', 'en', 'src_novel', 16""")
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        msg = str(e)
        assert "absent from the shipped interleave" in msg and "src_novel" in msg, \
            f"refusal fired with the wrong message: {msg}"
        print("PASS corpus_interleave_delta oracle refusal: "
              f"DuckDB threw naming src_novel ({n} clean rows before)")
        return
    raise SystemExit("FAIL: novel-source delta did not throw in DuckDB")

if __name__ == "__main__":
    main()
