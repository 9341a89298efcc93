#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/oracle_sql.json, registers <sfDir>/*.parquet as
views named by table, runs each SQL, and compares against the Spark
parquet dump in <verifyOutDir>/<key>/ — columns sorted by name, rows
sorted, values stringified.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for k, sql in sorted(sqls.items()):
        files = glob.glob(f"{outdir}/{k}/*.parquet")
        if not files:
            print(f"{k}: MISSING spark result"); fails += 1; continue
        st = pq.read_table(files[0])
        scols = st.column_names
        srows = [tuple(row) for row in zip(*[st.column(c).to_pylist() for c in scols])] if st.num_rows else []
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{k}: DUCKDB ERROR {e}"); fails += 1; continue
        sc, sr = canon(srows, scols)
        dc, dr = canon(drows, dcols)
        if sc != dc:
            print(f"{k}: SCHEMA MISMATCH spark={sc} duck={dc}"); fails += 1; continue
        if len(sr) != len(dr):
            print(f"{k}: ROWS {len(sr)} vs {len(dr)}"); fails += 1; continue
        if sr != dr:
            bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"{k}: HASH MISMATCH e.g. rows {[(sr[i], dr[i]) for i in bad]}"); fails += 1; continue
        print(f"{k}: OK ({len(sr)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
