#!/bin/bash
# Full differential sweep at gen-sf3 (VERDICT r07 item 2).
# Stage 1: Spark Verify dump of every oracle-checked query except the
#   documented exclusions; Stage 2: per-query DuckDB compare with a
#   300 s timeout each so one expensive oracle can't hang the sweep.
# Exclusions (same set as the gen-sf1 sweep, SURVEY §2.2):
#   q_graph_triangles            — deliberately unexecuted at sf>=1
#                                  (Θ(n³) on gendata's uniform density)
#   q_embed_pairs, q_dedup_clusters, q_dedup_survivors, q_semantic_dedup
#                                — DuckDB oracle cost (quadratic SQL),
#                                  Spark sides fine
#   q_contamination, q_dedup_ngram — DuckDB n-gram joins > budget
set -u
cd /root/repo
SF_DIR=/root/repo/gendata/sf3
OUT=/tmp/vout_sf3
LOG=/tmp/sweep_sf3.log
: > "$LOG"

EXCLUDE="q_graph_triangles q_embed_pairs q_dedup_clusters q_dedup_survivors q_semantic_dedup q_contamination q_dedup_ngram"

# stage 1: dump everything except the Spark-side exclusion
ALL=$(python3 - <<'EOF'
import json
names = json.load(open('/tmp/vout/oracle_sql.json'))
print(' '.join(sorted(names)))
EOF
)
RUN=""
for q in $ALL; do
  skip=0
  for e in $EXCLUDE; do [ "$q" = "$e" ] && skip=1; done
  [ $skip = 0 ] && RUN="$RUN $q"
done
echo "[sweep] dumping $(echo $RUN | wc -w) queries at sf3" | tee -a "$LOG"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF_DIR $OUT $RUN" \
  >> "$LOG" 2>&1
echo "[sweep] dump done, rc=$?" | tee -a "$LOG"

# stage 2: per-query compare with timeout
PASS=0; FAIL=0; TIMEOUT=0
for q in $RUN; do
  if [ ! -d "$OUT/$q" ]; then
    echo "SKIP $q (no spark output)" | tee -a "$LOG"; FAIL=$((FAIL+1)); continue
  fi
  timeout 300 python3 tools/compare.py "$SF_DIR" "$OUT" "$q" > /tmp/cmp_one.txt 2>&1
  rc=$?
  if [ $rc = 124 ]; then
    echo "TIMEOUT $q (oracle > 300s)" | tee -a "$LOG"; TIMEOUT=$((TIMEOUT+1))
  elif grep -q "^PASS $q" /tmp/cmp_one.txt; then
    echo "PASS $q" | tee -a "$LOG"; PASS=$((PASS+1))
  else
    echo "FAIL $q:" | tee -a "$LOG"
    grep "^FAIL" /tmp/cmp_one.txt | head -2 | tee -a "$LOG"
    FAIL=$((FAIL+1))
  fi
done
echo "== sf3 sweep: $PASS pass, $FAIL fail, $TIMEOUT oracle-timeout ==" | tee -a "$LOG"
