#!/usr/bin/env python3
"""Dev tool (driver-side python, like check.py — the shipped library is
pure Scala/Spark): materialize a ~10x replica of an sf dir for the
scale-check bench (VERDICT r7 #6). Replication is semantics-aware so
the scaled corpus stresses the same plan shapes instead of degenerate
ones:

- documents: replica k>0 token-prefixes every token with r<k>x —
  replicas are DISTINCT docs with disjoint vocab (10 "domains"), so the
  exact-dedup keeper set, the shingle index, and the band tables all
  grow ~10x (replicating verbatim would collapse to the sf0.1 keeper
  set after the O(n) exact pass and test nothing).
- embeddings: replica k cyclically shifts dims by 5k — norms and the
  isotropic distribution survive, but replicas are not near-dups of
  their originals (verbatim copies would plant 10-cliques in every LSH
  bucket). Query vectors (vec_id < 10) exist only in replica 0, so the
  ANN query load is constant while the corpus is 10x.
- events: user_id offset per replica PLUS a deterministic zipf-ish
  skew (VERDICT r8 #6): in each replica k>0, three whale users absorb
  ~25% / 12% / 8% of that replica's events (hash of event_id picks the
  tier — no RNG, reruns identical), the rest stay uniform. Uniform
  replication never exercised the sessionize whale path at scale; a
  real event log is zipf in users, so the scale bench must be too.
  Replica 0 is untouched (the original corpus is a subset). ts
  unchanged (10x density per window).
- orders/lineitem: orderkey remapped per replica; dimension tables
  (customer/supplier/part/region/nation) stay 1x — facts scale, dims
  don't, which keeps the broadcast-join story honest.

Usage: python3 tools/scale10.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1]
"""
import sys
import duckdb

REPLICAS = 10
OFF = 10_000_000

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def copy(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n0 = con.execute(f"SELECT count(*) FROM '{src}/{table}.parquet'").fetchone()[0]
        n1 = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n0} -> {n1}")

    rep = f"(SELECT unnest(generate_series(0, {REPLICAS - 1})) AS k) r"

    # dims: verbatim 1x
    for t in ["region", "nation", "customer", "supplier", "part"]:
        copy(t, f"SELECT * FROM '{src}/{t}.parquet'")

    copy("documents", f"""
        SELECT doc_id + r.k * {OFF} AS doc_id,
               CASE WHEN r.k = 0 THEN text
                    ELSE 'r' || r.k || 'x' ||
                         replace(text, ' ', ' r' || r.k || 'x') END AS text,
               lang, source,
               CASE WHEN r.k = 0 THEN n_chars
                    ELSE length('r' || r.k || 'x' ||
                         replace(text, ' ', ' r' || r.k || 'x'))::BIGINT
               END AS n_chars
        FROM '{src}/documents.parquet', {rep}""")

    copy("embeddings", f"""
        SELECT vec_id + r.k * {OFF} AS vec_id,
               CASE WHEN r.k = 0 THEN embedding
                    ELSE embedding[r.k * 5 + 1 :] || embedding[: r.k * 5]
               END AS embedding,
               label
        FROM '{src}/embeddings.parquet', {rep}
        WHERE r.k = 0 OR vec_id >= 10""")

    # zipf tiers: (event_id * Knuth multiplier) mod 1000 buckets the
    # event deterministically; replica-k whales live at 9e6 + tier*1e5
    # + k so whale ids never collide with offset uniform users
    zipf_u = f"(event_id * 2654435761) % 1000"
    copy("events", f"""
        SELECT event_id + r.k * {OFF} AS event_id, ts,
               CASE
                 WHEN r.k = 0 THEN user_id
                 WHEN {zipf_u} < 250 THEN 9000000 + r.k
                 WHEN {zipf_u} < 370 THEN 9100000 + r.k
                 WHEN {zipf_u} < 450 THEN 9200000 + r.k
                 ELSE user_id + r.k * {OFF}
               END AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', {rep}""")

    copy("orders", f"""
        SELECT o_orderkey + r.k * {OFF} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', {rep}""")

    copy("lineitem", f"""
        SELECT l_orderkey + r.k * {OFF} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', {rep}""")

if __name__ == "__main__":
    main()
