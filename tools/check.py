#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [--json PATH]
                              [--timeout SECS] [--progress]
                              [--only id1,id2,...]

Reads each Verify-written parquet result and the oracle_sql.json, runs the
oracle SQL in DuckDB over the same tables, sorts columns by name, and
compares values exactly (stricter than the driver's hash).

With --json PATH, additionally writes a CORRECTNESS-shaped artifact
{id: {rows_match, schema_match, hash_match, err}} so the round's
correctness record is regenerable and driver-independent (the round-11
driver artifact shipped empty; this file is the committed backstop).

With --timeout SECS each oracle runs in a KILLED-on-budget subprocess:
DuckDB's interrupt is not honored inside blockwise nested-loop joins
(the r14 sf0.1 run sat 50+ min inside one wedge-join oracle), so a
hard process kill is the only reliable budget. A timed-out oracle is
recorded as an explicit `oracle_timeout` exclusion — a DuckDB-runtime
statement, not a correctness failure."""
import sys, json, glob, time
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare_one(sf, out, name, sql):
    """Full compare for one id; returns the record tuple
    (status, err) with status in {pass, rows, schema, value, exec}."""
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-materialized corpora
        # (the sf1 campaign) are directories of part files
        src = f"{sf}/{t}.parquet"
        import os
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{src}')")
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        return ("exec", f"exec error: {e}"[:300])
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        return ("schema", f"cols spark={list(g.columns)} "
                          f"duck={list(w.columns)}"[:300])
    if len(g) != len(w):
        return ("rows", f"rows spark={len(g)} duck={len(w)}")
    gs = g.astype(str).reset_index(drop=True)
    ws = w.astype(str).reset_index(drop=True)
    if gs.equals(ws):
        return ("pass", "")
    neq = (gs != ws)
    bad_cols = [c for c in gs.columns if neq[c].any()]
    i = neq.any(axis=1).idxmax()
    return ("value", (f"value diff cols={bad_cols} first@row{i}: "
                      f"spark={gs.iloc[i].to_dict()} "
                      f"duck={ws.iloc[i].to_dict()}")[:500])


def _child(q, sf, out, name, sql):
    q.put(compare_one(sf, out, name, sql))


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    timeout = None
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = float(argv[i + 1])
        del argv[i:i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    progress = "--progress" in argv
    if progress:
        argv.remove("--progress")
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "/tmp/verify_out"
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, fails, skips = [], [], []
    record = {}

    def rec(name, rows, schema, hashm, err=""):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hashm, "err": err}

    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark result written"))
            rec(name, False, False, False, "no spark result written")
            continue
        t0 = time.time()
        if timeout:
            q = mp.Queue()
            p = mp.Process(target=_child, args=(q, sf, out, name, sql))
            p.start()
            p.join(timeout)
            if p.is_alive():
                p.kill()
                p.join()
                msg = f"oracle_timeout after {timeout:.0f}s (DuckDB runtime)"
                print(f"SKIP {name}: {msg}", flush=True)
                skips.append((name, msg))
                rec(name, None, None, None, msg)
                continue
            status, err = q.get() if not q.empty() else (
                "exec", "subprocess died without result")
        else:
            status, err = compare_one(sf, out, name, sql)
        if progress:
            print(f"... {name} {time.time() - t0:.1f}s", flush=True)
        if status == "pass":
            ok.append(name)
            rec(name, True, True, True)
        elif status == "rows":
            fails.append((name, err))
            rec(name, False, True, False, err)
        elif status == "schema":
            fails.append((name, err))
            rec(name, False, False, False, err)
        elif status == "value":
            fails.append((name, err))
            rec(name, True, True, False, err[:300])
        else:
            fails.append((name, err))
            rec(name, False, False, False, err)
    for n in ok:
        print(f"PASS {n}")
    for n, msg in fails:
        print(f"FAIL {n}: {msg[:500]}")
    print(f"\n{len(ok)} pass, {len(fails)} fail, {len(skips)} skipped, "
          f"{len(oracle)} oracled")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(record)} entries)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
