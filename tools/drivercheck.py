#!/usr/bin/env python3
"""Driver-accurate correctness check: replicates the pandas path the round
driver uses (DuckDB oracle -> .df(), Spark parquet -> pandas, sort columns
by name, sort rows by all columns, hash). This catches what the
duckdb-level selfcheck.py cannot:
  - DuckDB HUGEINT (SUM over ints) -> float64 vs Spark int64
  - array/list cells (pandas sort_values raises: unhashable ndarray)
  - dtype-sensitive hash differences

Usage: python3 tools/drivercheck.py <sfDir> <verifyOutDir> [query ...]
"""
import glob, json, os, sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir) or (only and name not in only):
            continue
        sql = oracle.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only)")
            n_skip += 1
            continue
        try:
            ddf = canon(con.execute(sql).df())
            # the driver reads the Spark result through DuckDB as well
            # (r1 evidence: DATE columns hash-matched, which requires both
            # sides to land as datetime64; lists crashed as ndarray cells)
            sdf = canon(con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(ddf.columns) != list(sdf.columns):
            print(f"FAIL {name}: columns duck={list(ddf.columns)} spark={list(sdf.columns)}")
            n_fail += 1
            continue
        if len(ddf) != len(sdf):
            print(f"FAIL {name}: rows duck={len(ddf)} spark={len(sdf)}")
            n_fail += 1
            continue
        dh = pd.util.hash_pandas_object(ddf, index=False).sum()
        sh = pd.util.hash_pandas_object(sdf, index=False).sum()
        if dh != sh:
            print(f"FAIL {name}: hash mismatch")
            for c in ddf.columns:
                if pd.util.hash_pandas_object(ddf[c], index=False).sum() != \
                   pd.util.hash_pandas_object(sdf[c], index=False).sum():
                    neq = ddf[c].ne(sdf[c])
                    print(f"   col {c}: dtypes duck={ddf[c].dtype} spark={sdf[c].dtype}, "
                          f"{int(neq.sum())} unequal cells")
                    for i in neq[neq].index[:3]:
                        print(f"     row {i}: duck={ddf[c][i]!r} spark={sdf[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ddf)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
