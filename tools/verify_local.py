#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Loads outDir/oracle_sql.json, runs each SQL in DuckDB against the sfDir
parquet tables, loads the Spark result parquet, sorts columns by name and
rows by value, and compares cell-by-cell.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm_cell(x) for x in v))
    return (str(type(v).__name__)[:1], str(v))


def norm_df(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        wc, wr = norm_df(want)
        gc, gr = norm_df(got)
        if wc != gc:
            print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
            n_fail += 1
        elif wr != gr:
            diff = [i for i, (a, b) in enumerate(zip(wr, gr)) if a != b][:3]
            print(f"FAIL {name}: rows differ (nspark={len(gr)} noracle={len(wr)})"
                  f" first_diff_idx={diff}")
            for i in diff:
                print(f"  oracle[{i}]={wr[i]}")
                print(f"  spark [{i}]={gr[i]}")
            if len(wr) != len(gr) and not diff:
                k = min(len(wr), len(gr))
                print(f"  extra oracle: {wr[k:k+2]}")
                print(f"  extra spark : {gr[k:k+2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    import os
    missing = [n for n in os.listdir(out_dir)
               if os.path.isdir(f"{out_dir}/{n}") and n not in oracle]
    for name in missing:
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            print(f"ROWS-ONLY {name}: {len(got)} rows (no oracle)")
            n_skip += 1
        except Exception as e:
            print(f"FAIL {name}: rows-only result unreadable: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
