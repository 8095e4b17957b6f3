#!/usr/bin/env python3
"""Engine-vs-engine dump compare: two graft.Verify output dirs, same
queries, EXACT multiset equality (DuckDB EXCEPT ALL both ways — handles
list columns and treats NaN as equal, like the driver's hash compare).
Used by the multi-executor gate (local-cluster[n,c,m] run vs the
local[N] run at the same tier): any drift means something does not
serialize/partition deterministically across executor boundaries.

Usage: compare_dumps.py <dirA> <dirB> [name,name,...]
Exit 0 = every compared query identical; 1 = any drift/missing.
"""
import sys, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
names = sorted(n for n in os.listdir(a)
               if os.path.isdir(os.path.join(a, n))
               and (only is None or n in only))
con = duckdb.connect()
bad = 0
for n in names:
    pb = os.path.join(b, n)
    if not os.path.isdir(pb):
        print(f"MISS {n}: absent in {b}"); bad += 1; continue
    try:
        ca = con.execute(f"SELECT count(*) FROM read_parquet('{a}/{n}/*.parquet')").fetchone()[0]
        cb = con.execute(f"SELECT count(*) FROM read_parquet('{pb}/*.parquet')").fetchone()[0]
        if ca != cb:
            print(f"FAIL {n}: rows {ca} vs {cb}"); bad += 1; continue
        drift = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT * FROM read_parquet('{a}/{n}/*.parquet') EXCEPT ALL "
            f" SELECT * FROM read_parquet('{pb}/*.parquet')) UNION ALL "
            f"(SELECT * FROM read_parquet('{pb}/*.parquet') EXCEPT ALL "
            f" SELECT * FROM read_parquet('{a}/{n}/*.parquet')))").fetchone()[0]
    except Exception as e:
        print(f"FAIL {n}: {e}"); bad += 1; continue
    if drift:
        print(f"FAIL {n}: {drift} drifted rows"); bad += 1; continue
    print(f"OK   {n}: {ca} rows identical")
print(f"[summary] {len(names) - bad}/{len(names)} identical")
sys.exit(1 if bad else 0)
