#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [--json PATH]

Reads each Verify-written parquet result and the oracle_sql.json, runs the
oracle SQL in DuckDB over the same tables, sorts columns by name, and
compares values exactly (stricter than the driver's hash).

With --json PATH, additionally writes a CORRECTNESS-shaped artifact
{id: {rows_match, schema_match, hash_match, err}} so the round's
correctness record is regenerable and driver-independent (the round-11
driver artifact shipped empty; this file is the committed backstop)."""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, fails = [], []
    record = {}

    def rec(name, rows, schema, hashm, err=""):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hashm, "err": err}

    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark result written"))
            rec(name, False, False, False, "no spark result written")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            fails.append((name, f"exec error: {e}"))
            rec(name, False, False, False, f"exec error: {e}"[:300])
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            fails.append((name, f"cols spark={list(g.columns)} "
                                f"duck={list(w.columns)}"))
            rec(name, len(g) == len(w), False, False,
                f"cols spark={list(g.columns)} duck={list(w.columns)}"[:300])
            continue
        if len(g) != len(w):
            fails.append((name, f"rows spark={len(g)} duck={len(w)}"))
            rec(name, False, True, False,
                f"rows spark={len(g)} duck={len(w)}")
            continue
        gs = g.astype(str).reset_index(drop=True)
        ws = w.astype(str).reset_index(drop=True)
        if gs.equals(ws):
            ok.append(name)
            rec(name, True, True, True)
        else:
            neq = (gs != ws)
            bad_cols = [c for c in gs.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            msg = (f"value diff cols={bad_cols} first@row{i}: "
                   f"spark={gs.iloc[i].to_dict()} "
                   f"duck={ws.iloc[i].to_dict()}")
            fails.append((name, msg))
            rec(name, True, True, False, msg[:300])
    for n in ok:
        print(f"PASS {n}")
    for n, msg in fails:
        print(f"FAIL {n}: {msg[:500]}")
    print(f"\n{len(ok)} pass, {len(fails)} fail, "
          f"{len(oracle)} oracled")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(record)} entries)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
