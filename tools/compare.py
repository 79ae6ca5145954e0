#!/usr/bin/env python3
"""Dev-loop comparator mimicking the driver's t2 gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the sf tables
registered as views, sorts columns by name, and compares cell-by-cell
(exact; floats must be bit-equal, mirroring a hash compare).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    threads = os.environ.get("COMPARE_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        spark = spark[sorted(spark.columns)]
        oracle = oracle[sorted(oracle.columns)]
        if list(spark.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(spark.columns)} "
                  f"vs {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(spark) != len(oracle):
            print(f"FAIL {name}: rows {len(spark)} vs {len(oracle)}")
            n_fail += 1
            continue
        bad = None
        srec, orec = spark.to_records(index=False), \
            oracle.to_records(index=False)
        for i in range(len(spark)):
            a, b = srec[i], orec[i]
            for c, (x, y) in enumerate(zip(a, b)):
                eq = (x == y)
                if not eq and isinstance(x, float) and isinstance(y, float):
                    eq = math.isnan(x) and math.isnan(y)
                if not eq:
                    bad = (i, spark.columns[c], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
