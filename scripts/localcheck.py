#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not shipped).

Usage: python3 scripts/localcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
fixture tables in <sfDir>, and compares: row count, column names, and values
(rows sorted by all columns, exact equality; floats compared bit-exactly to
match a hash-based driver).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_nooracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet written"); n_fail += 1; continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"NOORC {name}: rows={len(got)} (rows-only check)")
            n_nooracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        # normalize timestamp precisions for comparison
        for c in gc:
            if str(g[c].dtype).startswith("datetime") or str(e[c].dtype).startswith("datetime"):
                g[c] = pd.to_datetime(g[c]).astype("datetime64[us]")
                e[c] = pd.to_datetime(e[c]).astype("datetime64[us]")
        try:
            ok = g.equals(e)
            if not ok:
                # find first differing cell for diagnostics
                diff = None
                for c in gc:
                    neq = (g[c] != e[c]) & ~(g[c].isna() & e[c].isna())
                    if neq.any():
                        i = neq.idxmax()
                        diff = (c, i, g[c][i], e[c][i])
                        break
                if diff is None:
                    dt = {c: (str(g[c].dtype), str(e[c].dtype)) for c in gc
                          if str(g[c].dtype) != str(e[c].dtype)}
                    print(f"FAIL  {name}: dtype mismatch (got, expected): {dt}")
                else:
                    print(f"FAIL  {name}: value mismatch at {diff}")
                n_fail += 1
                continue
        except Exception as ex:
            print(f"FAIL  {name}: compare error {ex}"); n_fail += 1; continue
        print(f"PASS  {name}: rows={len(got)}")
        n_pass += 1
    missing = set(oracle) - set(names)
    for m in sorted(missing):
        print(f"FAIL  {m}: oracle present but no output dir"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
