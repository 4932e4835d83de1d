#!/usr/bin/env python3
"""Time the DuckDB oracle twins — the denominator of the engine-vs-
DuckDB ratio (VERDICT's 2x gate). Reads oracle_sql.json from a
graft.Verify output dir, runs each statement against the same parquet
tables (min of 2 runs, matching Bench's warm discipline), prints one
JSON line.

Usage: tools/twin_time.py <sfDir> <verifyOutDir> [only=q1,q2,...]
  only= restricts to a comma-separated query subset (the sf0.3 serve
  tier passes BenchTier's list so the 2x gate gets a same-scale
  comparison at the larger tier).
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    only = [a for a in sys.argv[3:] if a.startswith("only=")]
    if only:
        keep = set(only[0][len("only="):].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (the ScaleData sf0.3 tier) are DIRECTORIES
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{pat}')")
    # large tiers: let DuckDB spill instead of dying, and survive a
    # per-query failure (an OOM on one twin must not zero the pass —
    # the failed query is recorded and excluded from the total, which
    # under-counts DUCKDB's side, never the engine's)
    con.execute("SET temp_directory='/tmp/duck_twin_spill'")
    times, failed = {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        try:
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
        except Exception as e:
            failed[name] = str(e).split("\n")[0][:200]
        print(f"[twin] {name}: {times.get(name, 'FAILED')}",
              file=sys.stderr, flush=True)
    out = {"metric": "duckdb_twin_total",
           "value": round(sum(times.values()), 2),
           "unit": "sec", "queries": times,
           "sf": sf_dir.rstrip("/").split("/")[-1]}
    if failed:
        out["failed"] = failed
    print(json.dumps(out))


if __name__ == "__main__":
    main()
