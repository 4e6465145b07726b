#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing SparkEntry.oracleSql on the same tables.
Usage: check_oracle.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# bound the allocator explicitly: the default (80% of RAM, nproc threads)
# trips spurious bad-alloc under constrained/sandboxed environments
con.execute("SET threads=4")
con.execute("SET memory_limit='16GB'")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = ok = 0
for name in sorted(oracle):
    path = f"{outdir}/{name}"
    if not os.path.isdir(path):
        print(f"MISSING  {name} (no spark output)"); fail += 1; continue
    try:
        spark_df = pd.read_parquet(path)
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"ROWS     {name}: spark={len(s)} duck={len(d)}"); fail += 1; continue
    s = s.sort_values(by=list(s.columns), ignore_index=True)
    d = d.sort_values(by=list(d.columns), ignore_index=True)
    mismatch = None
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if sv.dtype != dv.dtype:
            # dtype mismatch is a schema-level problem worth surfacing
            print(f"DTYPE    {name}.{c}: spark={sv.dtype} duck={dv.dtype}")
        if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
            eq = (sv == dv) | (pd.isna(sv) & pd.isna(dv))
        else:
            eq = (pd.Series(sv).fillna('\0') == pd.Series(dv).fillna('\0')).to_numpy()
        if not eq.all():
            i = int(np.argmin(eq))
            mismatch = (c, i, sv[i], dv[i])
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"VALUE    {name}.{c}[{i}]: spark={a!r} duck={b!r}"); fail += 1
    else:
        print(f"OK       {name} ({len(s)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
