#!/usr/bin/env python3
"""DuckDB twin for ScaleProbe's percentile_scale row (round-10 q42
inversion evidence): time exact grouped percentiles over 1x/3x/10x
replicas of sf0.1 lineitem (10x ~= sf1) with the same value
perturbation the engine-side probe applies. DuckDB's quantile_cont is
the one-buffer in-memory form whose cost grows with the input, while
the engine's distributed rank-interval machinery amortizes its fixed
stage floor — the crossover trend is what this records.

Usage: python3 tools/percentile_probe.py [sfDir] [scales...]
"""
import sys, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
scales = [int(a) for a in sys.argv[2:]] or [1, 3, 10]

for s in scales:
    con = duckdb.connect()
    union = " UNION ALL ".join(
        f"SELECT l_returnflag, l_extendedprice + {i} AS l_extendedprice "
        f"FROM read_parquet('{sfdir}/lineitem.parquet')" for i in range(s))
    con.execute(f"CREATE TABLE li AS {union}")
    q = ("SELECT l_returnflag, "
         "quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.99]) AS qs "
         "FROM li GROUP BY 1 ORDER BY 1")
    con.execute(q).fetchall()          # warm
    t0 = time.time()
    con.execute(q).fetchall()
    print(f"duckdb_percentile {s:3d}x {time.time() - t0:8.2f}s")
    con.close()
