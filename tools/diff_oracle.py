#!/usr/bin/env python3
"""Per-cell oracle differ for ONE named query — the forensics tool behind
check_oracle.py's pass/fail gate.

Usage: python3 tools/diff_oracle.py <sfDir> <verifyOutDir> <queryName>

Prints, for the named query:
  - the DuckDB version the oracle ran under (version drift is the #1 suspect
    whenever the driver is red and local replay is green — r10's
    sketch_slotmin_quantiles);
  - both sides' column names and declared types;
  - every row, cell by cell, with repr() AND float.hex() for floats, so a
    round-trip/interpolation ulp at a rounding boundary (e.g. quantile_cont of
    2-decimal prices at .xx5 midpoints) is visible as a bit pattern, not an
    invisible "hash mismatch";
  - a MISMATCH marker on the first differing cell per row pair (rows aligned by
    the driver's sort: columns sorted by name, rows sorted by stringified value).

Exit 0 if all cells match bit-for-bit, 1 otherwise.
"""
import json, sys, glob, os
import duckdb


def cellfmt(c):
    if isinstance(c, float):
        return f"{c!r} [{c.hex()}]"
    return f"{c!r} ({type(c).__name__})"


def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    print(f"duckdb version: {duckdb.__version__}")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                    f"SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if name not in oracle:
        print(f"no oracle sql for {name}; known: {sorted(oracle)[:10]}...")
        return 2
    exp = con.execute(oracle[name])
    exp_cols = [d[0] for d in exp.description]
    exp_types = [d[1] for d in exp.description]
    exp_rows = exp.fetchall()
    got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    got_cols = [d[0] for d in got.description]
    got_types = [d[1] for d in got.description]
    got_rows = got.fetchall()
    print(f"oracle cols: {list(zip(exp_cols, exp_types))}")
    print(f"spark  cols: {list(zip(got_cols, got_types))}")
    eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
    gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    if sorted(exp_cols) != sorted(got_cols):
        print("COLUMN SET MISMATCH"); return 1
    cols = sorted(exp_cols)
    e_n = sorted(([r[i] for i in eidx] for r in exp_rows),
                 key=lambda r: [str(c) for c in r])
    g_n = sorted(([r[i] for i in gidx] for r in got_rows),
                 key=lambda r: [str(c) for c in r])
    print(f"rows: oracle={len(e_n)} spark={len(g_n)}")
    bad = 0
    for ri in range(max(len(e_n), len(g_n))):
        er = e_n[ri] if ri < len(e_n) else None
        gr = g_n[ri] if ri < len(g_n) else None
        if er is None or gr is None:
            print(f"row {ri}: only on one side — oracle={er} spark={gr}")
            bad += 1; continue
        row_bad = [ci for ci in range(len(cols)) if str(er[ci]) != str(gr[ci])]
        status = "MISMATCH" if row_bad else "ok"
        print(f"row {ri} [{status}]")
        for ci in range(len(cols)):
            mark = " <-- DIFFERS" if ci in row_bad else ""
            print(f"  {cols[ci]:>24}  oracle={cellfmt(er[ci])}")
            print(f"  {'':>24}  spark ={cellfmt(gr[ci])}{mark}")
        bad += len(row_bad)
    print(f"== {'MATCH' if bad == 0 else f'{bad} differing cells'} ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
