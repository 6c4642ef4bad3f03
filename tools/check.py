#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir]

Reads each Verify-written parquet result and the oracle_sql.json, runs the
oracle SQL in DuckDB over the same tables, sorts columns by name, and
compares values exactly (stricter than the driver's hash)."""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, fails = [], []
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark result written"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            fails.append((name, f"exec error: {e}"))
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            fails.append((name, f"cols spark={list(g.columns)} "
                                f"duck={list(w.columns)}"))
            continue
        if len(g) != len(w):
            fails.append((name, f"rows spark={len(g)} duck={len(w)}"))
            continue
        gs = g.astype(str).reset_index(drop=True)
        ws = w.astype(str).reset_index(drop=True)
        if gs.equals(ws):
            ok.append(name)
        else:
            neq = (gs != ws)
            bad_cols = [c for c in gs.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            fails.append((name, f"value diff cols={bad_cols} first@row{i}: "
                                f"spark={gs.iloc[i].to_dict()} "
                                f"duck={ws.iloc[i].to_dict()}"))
    for n in ok:
        print(f"PASS {n}")
    for n, msg in fails:
        print(f"FAIL {n}: {msg[:500]}")
    print(f"\n{len(ok)} pass, {len(fails)} fail, "
          f"{len(oracle)} oracled")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
