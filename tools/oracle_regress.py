#!/usr/bin/env python3
"""Dev-only oracle-side regression for q_fn_json_profile (ADVICE r9).

The engine side parses props with from_json → map<string,string> (key-
opaque); the DuckDB oracle must be key-opaque too. This script runs the
ORACLE SQL (extracted from Analytics39.scala, so it cannot drift from
what the driver runs) over the same metachar corpus Analytics39Spec
feeds the engine, and asserts the identical table — covering the
engine-vs-oracle comparison on keys containing '.', '"', '[', '$'.

Usage: python3 tools/oracle_regress.py
"""
import re
import sys

import duckdb

SRC = "src/main/scala/graft/queries/Analytics39.scala"

# Same corpus as Analytics39Spec (the Scala `\"` in a triple-quoted
# string is a literal JSON escape, i.e. key qu"ote).
ROWS = [
    '{"a.b": 1, "x": "y"}',
    '{"a.b": 2, "qu\\"ote": "z", "br[ack]et": 3, "$d": 4}',
    'not json',
]

# Same expected table as Analytics39Spec's assertion.
EXPECT = [
    ("$d", 1, 0.333333, 1, 4.0, 4.0),
    ("a.b", 2, 0.666667, 2, 1.0, 2.0),
    ("br[ack]et", 1, 0.333333, 1, 3.0, 3.0),
    ('qu"ote', 1, 0.333333, 0, None, None),
    ("x", 1, 0.333333, 0, None, None),
]


def extract_oracle_sql(path):
    src = open(path).read()
    m = re.search(
        r'"q_fn_json_profile"\s*->\s*"""(.*?)"""\.stripMargin',
        src, re.S)
    if not m:
        sys.exit("FAIL: could not extract q_fn_json_profile oracle SQL")
    lines = []
    for ln in m.group(1).split("\n"):
        i = ln.find("|")
        lines.append(ln[i + 1:] if i >= 0 else ln)
    return "\n".join(lines)


def main():
    sql = extract_oracle_sql(SRC)
    con = duckdb.connect()
    con.execute("CREATE TABLE events(props VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?)", [(r,) for r in ROWS])
    got = [tuple(r) for r in con.execute(sql).fetchall()]
    if got != EXPECT:
        print("FAIL q_fn_json_profile oracle on metachar corpus")
        print(" got:     ", got)
        print(" expected:", EXPECT)
        sys.exit(1)
    print("PASS q_fn_json_profile oracle is key-opaque on metachar corpus")


if __name__ == "__main__":
    main()
