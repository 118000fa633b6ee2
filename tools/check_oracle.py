#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers every parquet table in sfDir as a DuckDB view, runs each oracle SQL from
verifyOutDir/oracle_sql.json, loads the matching Spark result parquet, sorts columns by
name and rows by value, and compares cell-by-cell (exact for non-floats, 1e-9 rel for
floats — the driver hashes, so floats must round-trip identically; we warn on any
float that is not bit-equal).
"""
import json, math, sys, glob, os
import duckdb

def norm(rows):
    return sorted(tuple(str(c) for c in r) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        # driver sorts columns by name before hashing
        eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != oracle {sorted(exp_cols)}")
            n_fail += 1; continue
        e_n = norm([[r[i] for i in eidx] for r in exp_rows])
        g_n = norm([[r[i] for i in gidx] for r in got_rows])
        if e_n == g_n:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            for a, b in list(zip(e_n, g_n))[:200]:
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}")
                    break
            only_e = [r for r in e_n if r not in set(map(tuple, g_n))][:3]
            only_g = [r for r in g_n if r not in set(map(tuple, e_n))][:3]
            if only_e: print(f"  only-in-oracle: {only_e}")
            if only_g: print(f"  only-in-spark : {only_g}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
