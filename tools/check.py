#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<qkey> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name and rows by value, and compares. NOT part of the
shipped library (driver-side python tooling only).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for key, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {key}: exec error {str(e)[:200]}")
            fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL {key}: columns {gc} != {ec}")
            fail += 1
        elif gr != er:
            n = len(gr)
            m = len(er)
            diff = next((i for i in range(min(n, m)) if gr[i] != er[i]), None)
            print(f"FAIL {key}: rows {n} vs {m}; first diff at {diff}:")
            if diff is not None:
                print(f"  spark:  {gr[diff]}")
                print(f"  oracle: {er[diff]}")
            fail += 1
        else:
            print(f"OK   {key} ({len(gr)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
