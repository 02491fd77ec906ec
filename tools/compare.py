#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view, runs every query in
<verifyOutDir>/oracle_sql.json, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/ — schema (column names), row count, and a hash over the
column-name-sorted, row-sorted values.
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.sql(sql)
            o_cols = [c.lower() for c in o.columns]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        s = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [c.lower() for c in s.columns]
        s_rows = s.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        a, b = norm(o_rows, o_cols), norm(s_rows, s_cols)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(s_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
