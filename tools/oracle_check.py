#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [outDir]

Runs nothing itself — expects `graft.Verify` to have populated outDir
(spark results + oracle_sql.json). For each query: loads the Spark parquet
result, runs the oracle SQL in DuckDB over the same sfDir tables, sorts
columns by name and rows by all columns, and compares values exactly
(with a near-miss report for floats so rounding bugs are diagnosable).

Dev tool only — the engine itself has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            oracle_rel = con.execute(sql)
            o_cols = [d[0] for d in oracle_rel.description]
            o_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue

        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        o_ix = [o_cols.index(c) for c in sorted(o_cols)]
        s_sorted = sorted([tuple(norm(r[i]) for i in s_ix) for r in s_rows],
                          key=lambda r: tuple(str(x) for x in r))
        o_sorted = sorted([tuple(norm(r[i]) for i in o_ix) for r in o_rows],
                          key=lambda r: tuple(str(x) for x in r))
        if len(s_sorted) != len(o_sorted):
            print(f"FAIL {name}: rows spark={len(s_sorted)} oracle={len(o_sorted)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
            if a != b:
                bad = (i, a, b)
                break
        if bad is None:
            print(f"PASS {name} ({len(s_sorted)} rows)")
            n_pass += 1
        else:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i}")
            print(f"  cols   {sorted(s_cols)}")
            print(f"  spark  {a}")
            print(f"  oracle {b}")
            for x, y, c in zip(a, b, sorted(s_cols)):
                if x != y:
                    if isinstance(x, float) and isinstance(y, float):
                        print(f"    {c}: {x!r} vs {y!r} (delta {abs(x - y):.3e})")
                    else:
                        print(f"    {c}: {x!r} vs {y!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
