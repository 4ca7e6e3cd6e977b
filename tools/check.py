#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB against the same testdata, compare
row count, column names (sorted), and exact values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [tuple(canon(v) for v in row)
                        for row in con.sql(
                            f"SELECT {', '.join(got_cols)} FROM got").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(canon(v) for v in row)
                        for row in con.sql(
                            f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got_rows)} rows differ; first at {i}:")
            print(f"  spark : {g}")
            print(f"  duckdb: {e}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    # queries without an oracle: report rows only
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json") or name in oracle:
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name} ({n} rows)")
            n_noracle += 1
        except Exception as e:
            print(f"ROWS-ONLY {name}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
