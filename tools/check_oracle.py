#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, sorts columns by name, and compares shapes + values.
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    s = str(v)
    # pandas widens DATE to midnight datetimes — strip the zero time so
    # a Spark date32 and a DuckDB DATE compare equal.
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"EMPTY-RESULT {name}")
            n_fail += 1
            continue
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            print(f"SKIP(no-oracle) {name}: rows={len(got)}")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL(cols) {name}: spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        if got.shape != exp.shape:
            print(f"FAIL(shape) {name}: spark={got.shape} duck={exp.shape}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            g = [norm(v) for v in got[c].tolist()]
            e = [norm(v) for v in exp[c].tolist()]
            if g != e:
                i = next(i for i in range(len(g)) if g[i] != e[i])
                bad = (c, i, g[i], e[i])
                break
        if bad:
            print(f"FAIL(values) {name}: col={bad[0]} row={bad[1]} spark={bad[2]} duck={bad[3]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
