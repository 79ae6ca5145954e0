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

# Comparator routing (VERDICT r15 item 4 — promoted here from
# tools/sweep_pl.sh's case statement so the sliced-vs-one-shot choice is
# the tool's, not per-sweep tribal knowledge). For the five queries with
# a staged/sliced oracle (compare_sliced.ORACLES), route to it once the
# query's driver table outgrows the threshold; below it the one-shot
# DuckDB oracle is known-good. The probe is a count(*) on the driver
# table's parquet — footer metadata only, no scan. Each threshold sits
# between the largest decade where the one-shot form is recorded green
# and the smallest where it is recorded spilling to ENOSPC / blowing the
# sweep budget (sweeps/sweep_spot_sf30.jsonl; compare_sliced.py header):
#   q_pagerank         one-shot green at 4.5M orders (pl-sf3),
#                      >45 GB spill at 15M (pl-sf10)
#   q_graph_degree     one-shot "green" at 4.5M orders only with
#                      >35 GB of spill headroom (r17: the gen-sf3
#                      sweep hit ENOSPC at 35 GB free where r16's
#                      emptier disk passed), 715 s at 15M pre-
#                      repricing; sliced PASSes the same 4.5M dump in
#                      <2 min with bounded staging — routed sliced
#                      from 3M on robustness+cost, like triangles
#   q_graph_triangles  one-shot green at 45M orders but 387 s even
#                      after single-materialization (pl-sf30, r16);
#                      sliced PASS there in <3 min (staged 31 s) and
#                      one-shot spills >42 GB at 150M (pl-sf100) —
#                      routed sliced from 25M on cost, like degree
#   q_dedup_minhash_md5 green at 150k documents (gen-sf3);
#                      >300 s at 500k (gen-sf10)
#   q_embed_pairs_lsh  green at 60k embeddings (gen-sf3);
#                      >300 s at 200k (gen-sf10)
#   q_dedup_simhash_md5 / _wide_md5: green at 5k documents (sf0.1)
#                      but the one-shot unnests 64 (resp. 128) vote
#                      rows per TOKEN — >300 s at 150k docs (gen-sf3,
#                      the r16 sweep's sole non-compare); sliced form
#                      computes votes as SUM columns, no expansion
# COMPARE_ROUTE=oneshot|sliced overrides (negative controls, A/Bs).
SLICED_ROUTE = {
    "q_pagerank": ("orders", 8_000_000),
    "q_graph_degree": ("orders", 3_000_000),
    "q_graph_triangles": ("orders", 25_000_000),
    "q_dedup_minhash_md5": ("documents", 300_000),
    "q_embed_pairs_lsh": ("embeddings", 120_000),
    "q_dedup_simhash_md5": ("documents", 20_000),
    "q_dedup_simhash_wide_md5": ("documents", 20_000),
}


def route_sliced(con, sf_dir, name):
    """True when `name` should use the staged/sliced oracle here."""
    forced = os.environ.get("COMPARE_ROUTE")
    if forced == "oneshot":
        return False
    if forced == "sliced":
        return name in SLICED_ROUTE
    if name not in SLICED_ROUTE:
        return False
    table, threshold = SLICED_ROUTE[name]
    path = f"{sf_dir}/{table}.parquet"
    if not os.path.exists(path):
        return False
    rows = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    return rows > threshold


def first_mismatch(spark, oracle):
    """First differing (row, col, spark_val, oracle_val), or None.

    Vectorized per column (the pure-Python cell loop took >300 s on
    multi-million-row outputs at gen-sf3); verdict semantics identical
    to the original loop: exact equality, floats bit-equal except
    NaN==NaN. Columns whose object cells don't support elementwise ==
    (e.g. nested arrays) fall back to a per-cell loop.
    """
    import numpy as np
    for c in spark.columns:
        x = spark[c].to_numpy()
        y = oracle[c].to_numpy()
        try:
            with np.errstate(all="ignore"):
                eq = np.asarray(x == y)
            if eq.dtype != bool:
                raise TypeError("non-bool elementwise compare")
            if eq.shape != x.shape:
                raise TypeError("broadcast mismatch")
        except Exception:
            eq = np.fromiter(
                (bool(np.array_equal(a, b)) for a, b in zip(x, y)),
                dtype=bool, count=len(x))
        if x.dtype.kind == "f" and y.dtype.kind == "f":
            eq |= np.isnan(x) & np.isnan(y)
        if not eq.all():
            for i in np.flatnonzero(~eq):
                a, b = x[i], y[i]
                if (isinstance(a, float) and isinstance(b, float)
                        and math.isnan(a) and math.isnan(b)):
                    continue
                return (int(i), c, a, b)
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    if os.environ.get("COMPARE_SELFTEST_CRASH"):
        # Fault injection for the sweep harness's crash-vs-divergence
        # labeling (VERDICT r19 item 3b): die like a kernel OOM-kill —
        # no verdict line, no exception, no exit handler.
        os.kill(os.getpid(), 9)
    con = duckdb.connect()
    threads = os.environ.get("COMPARE_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    # Mirror compare_hash.main's spill config on THIS connection too: the
    # >20M-row hash auto-switch below runs its digests here, and an
    # in-memory DuckDB without a temp_directory cannot spill — it would
    # OOM on exactly the large outputs the switch exists for (ADVICE r14).
    # Harmless for the pandas path (a memory_limit only bounds DuckDB's
    # own operators; oracles that outgrow it now spill instead of dying).
    # Per-instance dir (PID-keyed unless DUCKDB_SPILL_DIR overrides) so
    # concurrent sweep instances can't rm each other's live temp blocks
    # — the r19 q_cond_funcs crash (VERDICT r19 item 3a).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from compare_hash import spill_dir
    con.execute(f"SET temp_directory='{spill_dir()}'")
    mem_gb = int(os.environ.get("COMPARE_MEM_GB", 48))
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        # variant corpora (ov-*/pl-*) carry only the tables their query
        # family reads; a missing parquet only matters if a query
        # actually references it (then that query fails, correctly)
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Outputs past this row count blow the pandas cell-exact path (both
    # sides load into memory); switch to the checksum comparator, which
    # streams inside DuckDB (VERDICT r13 item 5 — one entry point, the
    # spot scripts no longer partition their query sets by output size).
    # Cross-validated cell-exact at gen-sf30 + perturbed-oracle negative
    # control (sweeps/sweep_spot_sf30.jsonl).
    hash_rows = int(os.environ.get("COMPARE_HASH_ROWS", 20_000_000))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            dump_rows = con.execute(
                f"SELECT count(*) FROM "
                f"'{out_dir}/{name}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if route_sliced(con, sf_dir, name):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from compare_sliced import run as sliced_run
            try:
                ok = sliced_run(sf_dir, out_dir, name)
            except Exception as e:
                print(f"FAIL {name}: sliced comparator error: {e}")
                ok = False
            if ok:
                n_pass += 1
            else:
                n_fail += 1
            continue
        if dump_rows > hash_rows:
            from compare_hash import hash_compare
            try:
                ok, got, want = hash_compare(
                    con, f"{out_dir}/{name}/*.parquet", sql, name)
            except Exception as e:
                # one try wraps both digests — a Spark-dump read failure
                # mid-digest is NOT an oracle problem, so don't label it
                # 'oracle sql error' (ADVICE r14)
                print(f"FAIL {name}: hash comparator error: {e}")
                n_fail += 1
                continue
            if ok:
                print(f"PASS {name} ({got[0]} rows, hash comparator)")
                n_pass += 1
            else:
                print(f"FAIL {name}: spark(rows,sum)={got} oracle={want}"
                      f" (hash comparator)")
                n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        # The pandas-vs-hash switch keys on the SPARK dump's rows; a true
        # mismatch where the dump is small but the oracle is huge would
        # fetchdf() the full oracle and OOM instead of failing cleanly
        # (ADVICE r14) — bound the oracle side with a count first.
        # Materialize the oracle ONCE into a temp table (spills under
        # the memory_limit/temp_directory set above) and derive both the
        # count bound and the compared frame from it: running the full
        # pipeline twice (count(*) then fetchdf) doubled oracle cost for
        # every heavy-pipeline/small-output query, e.g. the ~46 s
        # pl-sf3 triangles oracle (ADVICE r15).
        try:
            con.execute(f"CREATE OR REPLACE TEMPORARY TABLE __o AS {sql}")
            oracle_rows = con.execute(
                "SELECT count(*) FROM __o").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if oracle_rows > hash_rows:
            print(f"FAIL {name}: rows {dump_rows} vs {oracle_rows} "
                  f"(oracle exceeds pandas budget; not loaded)")
            con.execute("DROP TABLE __o")
            n_fail += 1
            continue
        oracle = con.execute("SELECT * FROM __o").fetchdf()
        con.execute("DROP TABLE __o")
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
        bad = first_mismatch(spark, oracle)
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
