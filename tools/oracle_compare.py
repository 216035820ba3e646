#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness compare: for each
<name> under outDir, read the Spark parquet result and run <name>.sql in
DuckDB against the sf dir's parquet tables; compare row count, schema
(sorted column names), and a hash of the value matrix with columns
sorted by name and rows sorted. Usage:
  python3 tools/oracle_compare.py <sfDir> <outDir> <name...>
"""
import os, sys, glob, duckdb, pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.round(6) if any(df.dtypes == "float64") else df
    rows = sorted(df.astype(str).values.tolist())
    return rows

def main():
    sf, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    failures = 0
    for name in names:
        spark_files = glob.glob(f"{out}/{name}/*.parquet")
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
        sql_path = f"{out}/{name}.sql"
        if not os.path.exists(sql_path):
            print(f"{name}: no oracle SQL (rows-only query, {len(sdf)} rows) -> SKIPPED")
            continue
        osql = open(sql_path).read()
        odf = con.execute(osql).df()
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_schema and norm(sdf) == norm(odf)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: rows={len(sdf)}/{len(odf)} schema={ok_schema} "
              f"hash={ok_hash} -> {status}")
        if status == "FAIL" and ok_schema:
            a, b = norm(sdf), norm(odf)
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"  first diff row {i}: spark={x} oracle={y}")
                    break
        elif status == "FAIL":
            print(f"  spark cols={sorted(sdf.columns)} oracle cols={sorted(odf.columns)}")
    sys.exit(1 if failures else 0)

main()
