#!/usr/bin/env python3
"""Whole-suite replica of the driver's correctness compare, for scale
value-grading (PLANS.md: "proven right at scale", r10 verdict task 1):
reads EVERY oracle in <outDir>/oracle_sql.json, runs it in DuckDB
against <sfDir>'s parquet tables, and hash-compares against the Spark
parquet results under <outDir>/<name>/ — the same rows/schema/
sorted-value-matrix compare as tools/oracle_compare.py, over the full
graded suite. Writes a CORRECTNESS-style JSON to <reportPath>.

Usage:
  python3 tools/oracle_compare_all.py <sfDir> <outDir> <reportPath> [timeoutSec]

A per-query DuckDB timeout (default 600 s, via interrupt on a timer)
converts an oracle that cannot run at scale into a named reason
instead of a hung grade.
"""
import glob
import json
import os
import sys
import threading

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.round(6) if any(df.dtypes == "float64") else df
    return sorted(df.astype(str).values.tolist())


def main():
    sf, out, report = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0
    # optional 5th arg: comma-list of names to RE-grade, merging into an
    # existing report — the oracle-capacity retry path (an oracle that
    # blew DuckDB's temp disk or memory in the full sweep gets a second
    # pass with a bounded memory_limit / fresh temp dir without repaying
    # the other ~2h of oracles)
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    # optional 6th arg: engine dual-path agreement JSON (ValueAgree's
    # output) — a query whose DuckDB oracle cannot run at the probed
    # scale (quadratic wedge/iterative CTEs) is graded by two
    # INDEPENDENT engine implementations agreeing exactly at that scale
    # instead; the merged row carries `checked_by` naming the protocol
    # so a reader can tell an agreement grade from a DuckDB grade.
    agree = json.load(open(sys.argv[6])) if len(sys.argv) > 6 else {}
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    # a typo'd / renamed name in `only` would otherwise be silently
    # ignored: the loop never visits it, the stale prior-report row
    # survives the merge, and the recount presents it as freshly graded
    if only and only - set(sqls):
        sys.exit(f"unknown query names in only-set (not in oracle_sql.json): "
                 f"{sorted(only - set(sqls))}")
    # Spark-side named reasons (Verify's SPARK_GRAFT_QUERY_BUDGET_SEC
    # protocol): a query that cannot finish at the probed scale is a
    # skip with its reason, not a silent fail — symmetric with the
    # DuckDB-side timeout below.
    skip_path = f"{out}/skips.json"
    skips = json.load(open(skip_path)) if os.path.exists(skip_path) else {}
    con = duckdb.connect()
    # bound DuckDB's memory and give it a spill directory: the default
    # (80% of RAM, cwd temp) let one 100x oracle OOM outright and
    # another fill the root filesystem with spill
    tmp = os.environ.get("DUCKDB_TMP", f"{out}/_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        # driver testdata is a single file; MakeScaled writes a Spark
        # parquet directory — glob the part files in that case
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    results = json.load(open(report)) if only and os.path.exists(report) else {}
    n_pass = n_fail = n_skip = 0
    for name in sorted(sqls):
        if only is not None and name not in only:
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        results[name] = entry
        if name in agree:
            a = agree[name]
            ok = bool(a.get("pass"))
            entry["rows_match"] = entry["schema_match"] = ok
            entry["hash_match"] = ok
            entry["checked_by"] = f"{a.get('protocol')} — {a.get('detail')}"
            if ok:
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: agreement check failed: "
                      f"{a.get('detail')}", flush=True)
            continue
        if name in skips:
            entry["err"] = f"skipped: {skips[name]}"
            n_skip += 1
            continue
        spark_files = glob.glob(f"{out}/{name}/*.parquet")
        if not spark_files:
            entry["err"] = "missing spark result"
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
        entry["spark_rows"] = len(sdf)
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            odf = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001 - named reason in report
            if isinstance(e, duckdb.InterruptException):
                entry["err"] = (f"skipped: oracle exceeded {timeout:.0f}s "
                                "DuckDB budget at this scale")
                n_skip += 1
            else:
                entry["err"] = f"oracle: {str(e)[:200]}"
                n_fail += 1
            continue
        finally:
            timer.cancel()
        entry["oracle_rows"] = len(odf)
        entry["rows_match"] = len(sdf) == len(odf)
        entry["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        entry["hash_match"] = (entry["rows_match"] and entry["schema_match"]
                               and norm(sdf) == norm(odf))
        if entry["hash_match"]:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows={len(sdf)}/{len(odf)} "
                  f"schema={entry['schema_match']}", flush=True)
    # recount over the merged report (subset mode preloads prior rows)
    n_pass = sum(1 for v in results.values() if v["hash_match"])
    n_skip = sum(1 for v in results.values()
                 if not v["hash_match"] and str(v["err"]).startswith("skipped"))
    n_fail = len(results) - n_pass - n_skip
    json.dump(results, open(report, "w"), indent=1)
    print(f"value-graded {len(results)} queries at {sf}: "
          f"{n_pass} pass / {n_fail} fail / {n_skip} named-reason skips "
          f"-> {report}")
    sys.exit(1 if n_fail else 0)


main()
