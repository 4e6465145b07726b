#!/usr/bin/env python3
"""Allocator-pressure stress for the oracle suite: run every
SparkEntry.oracleSql entry under a tight DuckDB memory_limit (fresh
connection per query) and report which die first. The driver's checker
runs with a degraded allocator under load — an oracle that needs little
memory survives it (see ADVICE.md "Oracle discipline").

Usage: stress_oracle.py <sfDir> <verifyOutDir-with-oracle_sql.json> [limit]
"""
import duckdb, json, sys, time

sfdir, outdir = sys.argv[1], sys.argv[2]
limit = sys.argv[3] if len(sys.argv) > 3 else "200MB"
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(f"SET memory_limit='{limit}'")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        print(f"{name:28s} ok   {time.time()-t0:5.2f}s")
    except Exception as e:
        print(f"{name:28s} FAIL {str(e).splitlines()[0][:90]}")
        fails += 1
    con.close()
print(f"\n{len(oracle)-fails} ok, {fails} failed at memory_limit={limit}")
sys.exit(1 if fails else 0)
