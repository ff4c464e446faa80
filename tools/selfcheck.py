#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet written by
graft.Verify, sort columns by name + rows by value, compare exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(out, key=repr), [cols[i] for i in order]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows, dcols_s = canon(duck.fetchall(), dcols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = [d[0] for d in sp.description]
            srows, scols_s = canon(sp.fetchall(), scols)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {str(e)[:200]}"); n_fail += 1; continue
        if dcols_s != scols_s:
            print(f"FAIL {name}: columns differ duck={dcols_s} spark={scols_s}"); n_fail += 1; continue
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount duck={len(drows)} spark={len(srows)}"); n_fail += 1
            for i in range(min(3, max(len(drows), len(srows)))):
                d = drows[i] if i < len(drows) else None
                s = srows[i] if i < len(srows) else None
                print(f"   d={d}\n   s={s}")
            continue
        bad = [(i, d, s) for i, (d, s) in enumerate(zip(drows, srows)) if d != s]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(drows)} rows differ; first 3:")
            for i, d, s in bad[:3]:
                print(f"   row {i}\n   d={d}\n   s={s}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(drows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
