#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare — STRICT mode.

Usage: oracle_check.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/oracle_sql.json, registers <sfDir>/*.parquet as
views named by table, runs each SQL, and compares against the Spark
parquet dump in <verifyOutDir>/<key>/:
  1. column names (sorted),
  2. pandas dtypes — this is what the driver's hash compare is
     sensitive to (round-1 failure class: DuckDB sum(BIGINT) returns
     HUGEINT, which pandas coerces to float64, diverging from Spark's
     int64 even when values are equal),
  3. row count,
  4. stringified values after a deterministic multi-column sort.
"""
import sys, json, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for k, sql in sorted(sqls.items()):
        try:
            s = pd.read_parquet(f"{outdir}/{k}")  # reads ALL part files
        except Exception as e:
            print(f"{k}: MISSING spark result ({e})"); fails += 1; continue
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{k}: DUCKDB ERROR {e}"); fails += 1; continue
        cols = sorted(s.columns)
        if sorted(o.columns) != cols:
            print(f"{k}: SCHEMA MISMATCH spark={cols} duck={sorted(o.columns)}")
            fails += 1; continue
        s = s[cols].sort_values(cols).reset_index(drop=True)
        o = o[cols].sort_values(cols).reset_index(drop=True)
        ds, do = [str(x) for x in s.dtypes], [str(x) for x in o.dtypes]
        if ds != do:
            print(f"{k}: DTYPE MISMATCH spark={ds} duck={do} "
                  f"(add explicit CASTs to the oracle SQL)")
            fails += 1; continue
        if len(s) != len(o):
            print(f"{k}: ROWS {len(s)} vs {len(o)}"); fails += 1; continue
        neq = (s.astype(str) != o.astype(str)).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            print(f"{k}: VALUE MISMATCH e.g. row {i}: "
                  f"spark={s.iloc[i].tolist()} duck={o.iloc[i].tolist()}")
            fails += 1; continue
        print(f"{k}: OK ({len(s)} rows)")
    print(f"[oracle_check] {len(sqls) - fails}/{len(sqls)} strict-equal")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
