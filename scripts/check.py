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

def fresh_con(sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = fresh_con(sfdir)
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
        except Exception as first_err:
            # heavy oracles back-to-back (e.g. the two unrolled k-core
            # peels) can exhaust the shared connection's memory pool —
            # retry once on a fresh connection before declaring a FAIL.
            # (A deterministically failing oracle pays its query twice;
            # acceptable, FAILs are the exception path.)
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con(sfdir)
            try:
                exp = con.execute(sql).df()
            except Exception:
                # report the ORIGINAL error — the retry usually repeats it,
                # and when it doesn't, the first one is what happened
                print(f"FAIL {name}: oracle error: {str(first_err)[:200]}")
                n_fail += 1
                continue
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
    # ---- rows-only sketch twins ------------------------------------------
    # The five estimator-defined queries have no DuckDB hash oracle (sketch
    # internals are engine-specific); their accuracy contracts mirror
    # ApproxSpec: row/key parity with the exact twin plus a tolerance on
    # the estimate. With these, the local gate is green for EVERY query.
    def sketch_checks(con, outdir):
        def rows(name):
            df = load_spark(outdir, name)
            if df is None:
                raise AssertionError(f"no spark output for {name}")
            return df

        def chk_dau():
            a, e = rows("daily_active_users_approx"), rows("daily_active_users")
            assert set(a.day_start) == set(e.day_start), "day set differs"
            m = a.merge(e, on="day_start", suffixes=("_a", "_e"))
            assert (m.n_a == m.n_e).all(), "per-day row counts differ"
            err = (m.dau_a - m.dau_e).abs() / m.dau_e
            assert (err <= 0.05).all(), f"HLL err {err.max():.3f} > 5%"

        def chk_wau():
            a = rows("weekly_active_users_sketch")
            e = con.execute(
                """SELECT (epoch_us(ts)//1000000//604800)*604800 AS week_start,
                          count(DISTINCT user_id) AS wau
                   FROM events GROUP BY 1""").df()
            assert set(a.week_start) == set(e.week_start), "week set differs"
            m = a.merge(e, on="week_start", suffixes=("_a", "_e"))
            err = (m.wau_a - m.wau_e).abs() / m.wau_e
            assert (err <= 0.05).all(), f"union-HLL err {err.max():.3f} > 5%"
            assert a.n_days.between(1, 7).all(), "n_days outside 1..7"

        def chk_top_terms():
            a, e = rows("top_terms_sketch"), rows("top_terms")
            assert sorted(map(tuple, a.values.tolist())) == \
                sorted(map(tuple, e.values.tolist())), "sketch != exact top terms"

        def chk_deciles():
            a, e = rows("value_deciles_approx"), rows("value_deciles")
            for t, g in a.groupby("event_type"):
                tot_e = e[e.event_type == t].n.sum()
                assert g.n.sum() == tot_e, f"{t}: rows not conserved"
                assert g.decile.between(1, 10).all()
                ideal = tot_e / 10.0
                err = (g.n - ideal).abs() / ideal
                assert (err <= 0.25).all(), f"{t}: occupancy err {err.max():.3f} > 25%"

        def chk_percentiles():
            a, e = rows("percentiles_by_type_approx"), rows("percentiles_by_type")
            rng = con.execute(
                """SELECT event_type,
                          max(CAST(floor(value*1000) AS BIGINT))
                            - min(CAST(floor(value*1000) AS BIGINT)) AS r
                   FROM events GROUP BY 1""").df().set_index("event_type").r
            m = a.merge(e, on="event_type", suffixes=("_a", "_e"))
            assert (m.n_a == m.n_e).all(), "per-type counts differ"
            for p in ["p50", "p90", "p99"]:
                err = (m[f"{p}_a"] - m[f"{p}_e"]).abs() / m.event_type.map(rng)
                assert (err < 0.02).all(), f"{p} err {err.max():.4f} >= 2% of range"

        return {
            "daily_active_users_approx": chk_dau,
            "weekly_active_users_sketch": chk_wau,
            "top_terms_sketch": chk_top_terms,
            "value_deciles_approx": chk_deciles,
            "percentiles_by_type_approx": chk_percentiles,
        }

    for name, chk in sorted(sketch_checks(con, outdir).items()):
        if only and name not in only:
            continue
        try:
            chk()
            print(f"PASS {name} (rows-only vs exact twin)"); n_pass += 1
        except AssertionError as exc:
            print(f"FAIL {name}: {exc}"); n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
