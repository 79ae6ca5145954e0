#!/bin/bash
# Stage-2-only helper: DuckDB-compare every already-dumped query dir in
# $1 (a Verify out dir containing oracle_sql.json) against gendata $2,
# 300 s timeout per query. Appends to $3.
set -u
OUT=$1; SF_DIR=$2; LOG=$3
cd /root/repo
CMP=$(mktemp /tmp/cmp_one.XXXXXX)
trap 'rm -f "$CMP"' EXIT
PASS=0; FAIL=0; TMO=0
for d in "$OUT"/q_*/; do
  q=$(basename "$d")
  grep -q "^PASS $q\$\|^TIMEOUT $q " "$LOG" 2>/dev/null && continue
  timeout 300 python3 tools/compare.py "$SF_DIR" "$OUT" "$q" > "$CMP" 2>&1
  rc=$?
  if [ $rc = 124 ]; then
    echo "TIMEOUT $q (oracle > 300s)" | tee -a "$LOG"; TMO=$((TMO+1))
  elif grep -q "^PASS $q" "$CMP"; then
    echo "PASS $q" | tee -a "$LOG"; PASS=$((PASS+1))
  else
    echo "FAIL $q:" | tee -a "$LOG"
    grep -m3 "^FAIL" "$CMP" | tee -a "$LOG"
    FAIL=$((FAIL+1))
  fi
done
echo "== compare_dumped: $PASS pass, $FAIL fail, $TMO timeout ==" | tee -a "$LOG"
