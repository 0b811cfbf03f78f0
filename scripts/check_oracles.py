#!/usr/bin/env python3
"""Replicates the driver's correctness gate: run graft.Verify, then
compare each query's parquet output against its DuckDB oracle.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out
"""
import duckdb, json, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf: str, out: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        d = f"{out}/{name}"
        if not os.path.isdir(d):
            print(f"{name}: MISSING spark output"); bad += 1; continue
        try:
            sp = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
            du = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: SQL ERROR {str(e)[:200]}"); bad += 1; continue
        sp = sp[sorted(sp.columns)].sort_values(by=sorted(sp.columns)).reset_index(drop=True)
        du = du[sorted(du.columns)].sort_values(by=sorted(du.columns)).reset_index(drop=True)
        if list(sp.columns) != list(du.columns):
            print(f"{name}: COLUMN MISMATCH {list(sp.columns)} vs {list(du.columns)}")
            bad += 1
        elif sp.equals(du):
            print(f"{name}: OK rows={len(sp)}"); ok += 1
        else:
            print(f"{name}: MISMATCH rows {len(sp)} vs {len(du)} "
                  f"dtypes {dict(sp.dtypes)} vs {dict(du.dtypes)}")
            bad += 1
    print(f"== {ok} OK, {bad} BAD")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
