#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (parquet per query) against the DuckDB oracle
SQL (oracle_sql.json) over the same testdata dir, canonicalizes both
sides (columns sorted by name, rows sorted, doubles rounded to 6dp,
timestamps rendered UTC to the second) and hash-compares.

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for _, row in df.iterrows():
        cells = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{round(v, 6):.6f}")
            elif isinstance(v, pd.Timestamp):
                cells.append(v.strftime("%Y-%m-%d %H:%M:%S"))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                cells.append("[" + ",".join(f"{round(float(x),6):.6f}" for x in v) + "]")
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    # driver may sort rows; queries declare total order anyway — sort to be safe
    out.sort()
    return hashlib.sha256("\n".join(out).encode()).hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no engine output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc_got, sc_want = sorted(got.columns), sorted(want.columns)
        if sc_got != sc_want:
            print(f"FAIL {name}: schema {sc_got} != {sc_want}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        hg, hw = canon(got), canon(want)
        if hg != hw:
            print(f"FAIL {name}: hash {hg} != {hw}")
            merged = got.reindex(sorted(got.columns), axis=1)
            print("  engine:", merged.head(3).to_dict("records"))
            wm = want.reindex(sorted(want.columns), axis=1)
            print("  oracle:", wm.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
