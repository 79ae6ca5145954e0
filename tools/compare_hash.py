#!/usr/bin/env python3
"""Order-independent checksum compare for outputs too big for pandas.

tools/compare.py (and the sf30/sf100 spot ladders built on it) loads
BOTH sides of a compare into pandas, which caps the verifiable output
size at ~20M rows. This tool verifies the same equality contract with
bounded memory: it canonicalizes every row to a text form INSIDE
DuckDB (columns sorted by name, each cast to the Spark dump's parquet
type so both sides take the identical type→VARCHAR path; each field
encoded prefix-free as 'N' for NULL or 'V<len>:<value>' so the
concatenation is INJECTIVE — no separator char a value could contain,
no sentinel a value could equal; ADVICE r13), hashes each row
(md5_number_lower, 64-bit), and compares
(row count, HUGEINT sum of row hashes) between the Spark dump and the
one-shot oracle. The digest is order-independent (the contract ORDER
BY is irrelevant to set equality) and multiplicity-correct (duplicate
rows add their hash twice), so PASS ⟺ both sides are equal as
multisets of canonicalized rows, up to 64-bit hash-collision odds
(~2^-64 per differing row pair — astronomically below the cell-exact
comparator's coverage but over outputs 10× larger than it can load).

Float caveat shared with the driver's gate: DOUBLE columns must be
bit-equal cross-engine (the repo's determinism contract); both sides
format through DuckDB's own DOUBLE→VARCHAR, so bit-equal values
canonicalize identically.

Usage: compare_hash.py <sfDir> <verifyOutDir> <query> [mem_gb=48]
Prints PASS/FAIL with both (rows, checksum) tuples.
"""
import atexit
import json
import os
import shutil
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def log(msg):
    print(f"[hash {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def spill_dir():
    """Per-instance DuckDB temp_directory (VERDICT r19 item 3a).

    The r19 concurrent gen-sf100 sweeps shared a single
    /tmp/duckdb_hash_spill: one instance's post-kill orphan cleanup
    rm'd temp blocks a LIVE compare in the other instance still held
    open (q_cond_funcs: 'Cannot open file ..._temp_block-*.block').
    Default is keyed on PID so two comparators can never collide;
    DUCKDB_SPILL_DIR overrides for deliberate sharing (e.g. pointing
    at a bigger volume). The PID-default dir is removed at exit —
    it is exclusively ours — while an override dir is left alone.
    """
    d = os.environ.get("DUCKDB_SPILL_DIR")
    if d:
        return d
    d = f"/tmp/duckdb_hash_spill_{os.getpid()}"
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def check_free_disk(where="/tmp"):
    """Refuse a row-scale digest when free disk is below the floor
    (VERDICT r19 item 3a). The big sf100 digests (q_math_funcs,
    q_unpivot, q_cond_funcs: ~600M rows) spill 30-40 GB of DuckDB
    temp; starting one against a nearly-full disk dies mid-digest
    with ENOSPC after burning ~10 min (two r19 rows). A loud refusal
    BEFORE the digest is a scheduling signal, not a failure.
    COMPARE_MIN_FREE_GB overrides the 25 GB default (0 disables).
    """
    floor_gb = float(os.environ.get("COMPARE_MIN_FREE_GB", 25))
    free_gb = shutil.disk_usage(where).free / 2**30
    if free_gb < floor_gb:
        raise RuntimeError(
            f"refused: free disk {free_gb:.1f} GB < {floor_gb:.0f} GB "
            f"floor for a row-scale digest (COMPARE_MIN_FREE_GB to "
            f"override); free space or lower the spill footprint first")


def hash_compare(con, dump, oracle_sql, query):
    """Checksum-compare the Spark dump glob vs the oracle SQL (both run
    on `con`, which must already have the input views registered).
    Returns (ok, got, want) with got/want = (rows, checksum). Importable
    — tools/compare.py and compare_sliced.py auto-switch to this path
    when the dump exceeds the pandas comparator's row budget (VERDICT
    r13 item 5: one comparator entry point, no manual query partition).
    """
    check_free_disk()
    # Canonical column order + types come from the Spark dump's parquet
    # schema; the oracle side is cast to the SAME types so both sides
    # take one type→VARCHAR path.
    desc = con.execute(
        f"DESCRIBE SELECT * FROM '{dump}'").fetchall()
    types = {r[0]: r[1] for r in desc}
    names = sorted(types)

    def digest(src, side):
        # Prefix-free field encoding: NULL -> 'N', value v -> 'V<len>:v'.
        # Decoding is unambiguous left-to-right (read tag, then digits
        # to ':', then exactly len chars), so the row string is
        # injective in the field tuple — a value containing the old
        # chr(31) separator, or equal to the old chr(30) NULL sentinel,
        # can no longer shift boundaries or alias NULL (ADVICE r13).
        casts = ", ".join(
            f"CAST(CAST(\"{n}\" AS {types[n]}) AS VARCHAR) AS v{i}"
            for i, n in enumerate(names))
        fields = " || ".join(
            f"CASE WHEN v{i} IS NULL THEN 'N' ELSE 'V' ||"
            f" CAST(length(v{i}) AS VARCHAR) || ':' || v{i} END"
            for i in range(len(names)))
        t0 = time.time()
        n, h = con.execute(
            f"SELECT count(*),"
            f" coalesce(sum(CAST(md5_number_lower("
            f"   {fields}) AS HUGEINT)), 0)"
            f" FROM (SELECT {casts} FROM ({src}))").fetchone()
        log(f"{side}: rows={n} checksum={h} ({time.time() - t0:.1f}s)")
        return n, int(h)

    log(f"{query}: columns {names}")
    got = digest(f"SELECT * FROM '{dump}'", "spark")
    want = digest(oracle_sql, "oracle")
    return got == want, got, want


def main():
    sf_dir, out_dir, query = sys.argv[1], sys.argv[2], sys.argv[3]
    mem_gb = int(sys.argv[4]) if len(sys.argv) > 4 else 48
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{spill_dir()}'")
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        # variant corpora (ov-*/pl-*) carry only the tables their query
        # family reads; a missing parquet only matters if a query
        # actually references it (then that query fails, correctly)
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[query]
    ok, got, want = hash_compare(
        con, f"{out_dir}/{query}/*.parquet", sql, query)
    if ok:
        print(f"PASS {query} ({got[0]} rows, checksums equal)")
    else:
        print(f"FAIL {query}: spark(rows,sum)={got} oracle={want}")
        sys.exit(1)


if __name__ == "__main__":
    main()
