#!/usr/bin/env python3
"""Allocator-pressure stress for the oracle suite.

Two modes:

* per-query (default): every SparkEntry.oracleSql entry under a tight
  DuckDB memory_limit, fresh connection per query — isolates which
  individual oracle needs the most working memory.

* --driver: faithful replica of the driver checker's failure mode from
  round 10 (CORRECTNESS_r10: 9 OutOfMemoryException rows at the lexical
  tail): ONE long-lived connection, NO DuckDB memory_limit (the driver
  runs the default 80%-of-RAM allocator), queries in sorted order,
  results pulled through fetchdf() into pandas like the real compare —
  all under a hard process-level address-space cap (RLIMIT_AS), so the
  allocator sees a memory-starved host. If the suite's mid-run
  high-water mark leaves too little for the tail, the tail dies here
  first instead of in the driver's artifact.

Usage:
  stress_oracle.py <sfDir> <outDir> [limit]            # per-query, e.g. 100MB
  stress_oracle.py <sfDir> <outDir> --driver [capGB]   # single-conn, default 4
"""
import json, sys, time

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

if len(sys.argv) > 3 and sys.argv[3] == "--driver":
    cap_gb = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0
    import resource
    cap = int(cap_gb * (1 << 30))
    resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
    # import AFTER the cap so duckdb/pandas arena setup also lives inside it
    import duckdb, pandas as pd  # noqa: E402
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    def vm_gb():
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmSize:"):
                    return int(ln.split()[1]) / (1 << 20)
        return 0.0
    fails = 0
    for name in sorted(oracle):
        t0 = time.time()
        try:
            df = con.execute(oracle[name]).fetchdf()
            print(f"{name:28s} ok   {time.time()-t0:5.2f}s {len(df):8d} rows  vm={vm_gb():5.2f}GB")
            del df
        except MemoryError:
            print(f"{name:28s} FAIL MemoryError (python allocator)  vm={vm_gb():5.2f}GB"); fails += 1
        except Exception as e:
            print(f"{name:28s} FAIL {str(e).splitlines()[-1][:90]}  vm={vm_gb():5.2f}GB"); fails += 1
    print(f"\n{len(oracle)-fails} ok, {fails} failed — single connection, "
          f"no memory_limit, RLIMIT_AS={cap_gb:g}GB")
    sys.exit(1 if fails else 0)

import duckdb  # noqa: E402
limit = sys.argv[3] if len(sys.argv) > 3 else "200MB"
fails = 0
for name in sorted(oracle):
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(f"SET memory_limit='{limit}'")
    for t in TABLES:
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
