#!/usr/bin/env python3
"""Local correctness pre-check: replay the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
each <sfDir>/<table>.parquet registered as a view. Compares values strictly
(column names sorted, rows in emitted order).
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
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.10g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got_rel.columns
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
        elif got != exp:
            diffs = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp)) if g != e]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; "
                  f"first diffs: {diffs[:3]}"
                  + (f" (extra got: {got[len(exp):][:2]})" if len(got) > len(exp) else "")
                  + (f" (extra exp: {exp[len(got):][:2]})" if len(exp) > len(got) else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
