#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json. Runs each oracle in
DuckDB over the same parquet tables and compares (rows, schema, values).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # value compare, order-sensitive then order-insensitive
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    ok = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                ok = False
            if not ok:
                mismatch = c; break
        if mismatch is None:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            gs = got.sort_values(list(got.columns)).reset_index(drop=True)
            es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
            if gs.astype(str).equals(es.astype(str)):
                print(f"PASS(unordered) {name}: col {mismatch} differs in order only")
                n_pass += 1
            else:
                print(f"FAIL {name}: col {mismatch} value mismatch")
                m = (got[mismatch].astype(str) != exp[mismatch].astype(str))
                idx = m[m].index[:3]
                for i in idx:
                    print(f"   row {i}: spark={got[mismatch][i]!r} duck={exp[mismatch][i]!r}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
