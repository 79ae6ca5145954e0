#!/bin/bash
# Disk-budgeted differential sweep (r19, for gen-sf100): same
# derivation/exclusion/compare semantics as sweep_sfN.sh, but the dump
# runs in BATCHES and each query's dump dir is deleted as soon as its
# compare PASSes — at sf100 the row-scale dumps (scan/filter/window
# families are ~600 M rows each) would otherwise exceed the box's free
# disk before the first compare starts. A batch is one Verify JVM, so
# an OOM costs one batch, not the whole sweep (the sf30 lesson:
# 28 g default killed 63 queued dumps; SPARK_DRIVER_MEM sized below).
#
# Usage: sweep_batched.sh <sfDirRel> <batchSize> [extra-exclude ...]
#   tools/sweep_batched.sh gendata/sf100 20 q_graph_degree ...
set -u
cd /root/repo
export SPARK_GRAFT_COOC_PAIR_CAP=${SPARK_GRAFT_COOC_PAIR_CAP:-4000000000}
# The sf30 lesson priced the dump JVM at >=48g (28g default OOM'd on
# minhash_md5 and took 63 queued dumps with it); build.sbt reads this.
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
SF_DIR=/root/repo/${1:?usage: sweep_batched.sh <sfDirRel> <batchSize> [excl ...]}
BATCH=${2:?batch size}
shift 2
# OUT_DIR/LOG_FILE overrides let two instances run disjoint ONLY sets
# concurrently (dump JVM of one overlaps DuckDB compares of the other —
# the box-level pipeline the serial loop can't express).
OUT=${OUT_DIR:-/tmp/vout_$(basename "$SF_DIR")}
LOG=${LOG_FILE:-/tmp/sweep_batched_$(basename "$SF_DIR").log}
: > "$LOG"

# standing exclusions — same set and reasons as sweep_sfN.sh
EXCLUDE="q_graph_triangles q_embed_pairs q_dedup_clusters q_dedup_survivors q_semantic_dedup q_contamination q_dedup_ngram $*"

mkdir -p "$OUT"
# Serialize COMPILATION across concurrent instances (ADVICE r19): two
# sbt processes share target/ and zinc incremental state, and racing a
# compile corrupts it if any source changed since the last build. The
# flock'd no-op compile makes the build current exactly once; the
# per-batch runMain calls below then find it up-to-date and just fork
# the JVM (safe concurrently). flock blocks, it doesn't skip — the
# second instance waits for the first instance's compile to finish.
flock /tmp/graft_sbt_build.lock sbt -batch compile >> "$LOG" 2>&1 \
  || { echo "[batched] COMPILE FAILED — see $LOG" | tee -a "$LOG"; exit 1; }
sbt -batch "runMain graft.Verify $SF_DIR $OUT --sql-only" >> "$LOG" 2>&1
ALL=$(python3 - "$OUT/oracle_sql.json" <<'EOF'
import json, sys
print(' '.join(sorted(json.load(open(sys.argv[1])))))
EOF
)
# ONLY="q_a q_b" restricts the sweep to that subset (still minus
# exclusions) — used to hold the sliced-oracle queries back until
# their staging pass finishes, avoiding two writers in one
# slicecmp_* staging dir.
RUN=""
for q in $ALL; do
  skip=0
  for e in $EXCLUDE; do [ "$q" = "$e" ] && skip=1; done
  if [ -n "${ONLY:-}" ]; then
    keep=0
    for o in $ONLY; do [ "$q" = "$o" ] && keep=1; done
    [ $keep = 0 ] && skip=1
  fi
  [ $skip = 0 ] && RUN="$RUN $q"
done
set -- $RUN
TOTAL=$#
echo "[batched] $TOTAL queries at $SF_DIR, batch=$BATCH" | tee -a "$LOG"

PASS=0; FAIL=0; CRASH=0; TIMEOUT=0; N=0
CMP=$(mktemp /tmp/cmp_b.XXXXXX)
trap 'rm -f "$CMP"' EXIT
while [ $# -gt 0 ]; do
  QS=""
  i=0
  while [ $# -gt 0 ] && [ $i -lt "$BATCH" ]; do
    QS="$QS $1"; shift; i=$((i+1))
  done
  N=$((N+1))
  echo "[batched] batch $N: dump$QS" | tee -a "$LOG"
  SPARK_GRAFT_CPUS=${DUMP_CPUS:-16} SPARK_GRAFT_SHUFFLE_PARTS=256 \
    sbt -batch "runMain graft.Verify $SF_DIR $OUT $QS" >> "$LOG" 2>&1
  if [ -s "$OUT/errors.json" ] && [ "$(cat "$OUT/errors.json")" != "{}" ]; then
    echo "[batched] DUMP FAILURES: $(cat "$OUT/errors.json")" | tee -a "$LOG"
  fi
  for q in $QS; do
    if [ ! -d "$OUT/$q" ]; then
      echo "SKIP $q (no spark output)" | tee -a "$LOG"; FAIL=$((FAIL+1))
      continue
    fi
    timeout "${CMP_TIMEOUT:-900}" \
      python3 tools/compare.py "$SF_DIR" "$OUT" "$q" > "$CMP" 2>&1
    rc=$?
    if [ $rc = 124 ]; then
      echo "TIMEOUT $q (oracle > ${CMP_TIMEOUT:-900}s)" | tee -a "$LOG"
      TIMEOUT=$((TIMEOUT+1))
    elif grep -q "^PASS $q" "$CMP"; then
      echo "PASS $q" | tee -a "$LOG"; PASS=$((PASS+1))
      rm -rf "${OUT:?}/$q"   # reclaim the dump as soon as it's green
    elif grep -q "^FAIL" "$CMP"; then
      echo "FAIL $q:" | tee -a "$LOG"
      grep "^FAIL" "$CMP" | head -2 | tee -a "$LOG"
      FAIL=$((FAIL+1))
    else
      # No PASS and no FAIL line: the comparator process itself died
      # (kernel OOM-kill, segfault, interpreter error) before reaching
      # a verdict. That is NOT a divergence — label it distinctly and
      # show the evidence (VERDICT r19 item 3b; three r19 rows read as
      # bare FAIL when the comparator had been killed mid-digest).
      echo "COMPARATOR-CRASH $q (rc=$rc, no verdict line):" | tee -a "$LOG"
      tail -5 "$CMP" | sed 's/^/    /' | tee -a "$LOG"
      CRASH=$((CRASH+1))
    fi
  done
  df -h / | tail -1 | tee -a "$LOG"
done
echo "== $(basename "$SF_DIR") batched sweep: $PASS pass, $FAIL fail, $CRASH comparator-crash, $TIMEOUT oracle-timeout (of $TOTAL) ==" | tee -a "$LOG"
