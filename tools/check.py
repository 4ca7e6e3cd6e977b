#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB against the same testdata, compare
row count, column names (sorted), and exact values.

Besides the exact zip-compare (good for diagnosis), a second pass mimics
the driver's checker: load both sides into pandas, sort rows across ALL
columns, and hash a CSV serialization. This catches what the zip-compare
cannot: dtype divergence (DuckDB sum(BIGINT) -> HUGEINT -> float64 in
pandas, vs Spark's int64 — "3.0" != "3" in the hash) and unsortable
columns (list-typed values crash pandas sort_values, as the driver's
r03 run showed for q_array_agg).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [onlyQuery1,onlyQuery2]
The optional third argument restricts the compare to the named queries
(at-scale gates run a handful of feasible oracles against a clone
corpus; without the filter every dumped query's oracle would run).
"""
import hashlib
import json
import math
import sys

import duckdb


def driver_hash(rel):
    """Mimic the driver: pandas frame, columns sorted by name, rows sorted
    across all columns, then hash the CSV text. Raises on unsortable
    (e.g. list-typed) columns — exactly like the driver does."""
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark writes directory-style parquet (part files inside);
        # the generator writes single files — accept both layouts
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    if only:
        # a requested name with no oracle entry must FAIL, not silently
        # shrink the compare to nothing — a typo'd at-scale gate would
        # otherwise record "0 pass, 0 fail" as success
        for name in sorted(set(only) - set(oracle)):
            print(f"FAIL {name}: requested but not in oracle_sql.json")
            n_fail += 1
        oracle = {k: v for k, v in oracle.items() if k in only}
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
        # driver-mimic pass: pandas sort + CSV hash (catches dtype drift);
        # reuses the relations built above
        try:
            h_got = driver_hash(got)
            h_exp = driver_hash(exp)
        except Exception as e:
            print(f"FAIL {name}: driver-mimic hash raised: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if h_got != h_exp:
            print(f"FAIL {name}: values equal but driver-style hash differs "
                  f"(dtype drift, e.g. HUGEINT->float64?)")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    # queries without an oracle: report rows only
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json") or name in oracle or only:
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
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
