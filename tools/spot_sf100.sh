#!/bin/bash
# gen-sf100 sliced-oracle spot extension: the sf30 spot set's queries
# whose OUTPUT stays <= ~20M rows at sf100 (the comparator loads both
# sides into pandas, so the 100M-row-output members of the sf30 set —
# q_sessionize / q_scd2 / q_window_analytic / q_join_salted — would be
# a memory blowup, not an oracle; they stay sf30-verified). Spark-dumped
# once, then DuckDB-compared per query with a 900 s budget, results
# appended to sweeps/sweep_spot_sf100.jsonl. Run with NO concurrent
# Spark job — a spilling oracle can fill the disk (playbook).
set -u
cd /root/repo
QS="q_resample_ffill q_cooccur_window q_window_sliding q_window_rank \
q_window_tumbling q_join_asof_nearest q_rank_bm25"
OUT=/tmp/vout_spot100
LOG=/tmp/spot_sf100.log
ART=sweeps/sweep_spot_sf100.jsonl
mkdir -p sweeps
: > "$LOG"
if [ "${1:-}" != "--compare-only" ]; then
  echo "[spot $(date +%H:%M:%S)] dumping: $QS" | tee -a "$LOG"
  SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify gendata/sf100 $OUT $QS" \
    >> "$LOG" 2>&1
  echo "[spot] dump rc=$?" | tee -a "$LOG"
fi
for q in $QS; do
  if [ ! -d "$OUT/$q" ]; then
    echo "{\"sf\":\"gendata/sf100\",\"query\":\"$q\",\"status\":\"no_dump\"}" >> "$ART"
    continue
  fi
  t0=$(date +%s)
  timeout 900 python3 tools/compare.py gendata/sf100 "$OUT" "$q" > /tmp/spot_one.log 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  # pass/fail only from a PRINTED verdict; a comparator that exits
  # nonzero without printing one (missing oracle_sql.json, crash) is
  # status=error, distinguishable from a true mismatch (ADVICE r13)
  if [ $rc = 124 ]; then st=oracle_timeout
  elif grep -q "^PASS $q" /tmp/spot_one.log; then st=pass
  elif grep -q "^FAIL $q" /tmp/spot_one.log; then st=fail
  else st=error; fi
  rows=$(grep -oE "\(([0-9]+) rows" /tmp/spot_one.log | grep -oE "[0-9]+" | head -1)
  echo "{\"sf\":\"gendata/sf100\",\"query\":\"$q\",\"status\":\"$st\",\"sec\":$dt,\"rows\":${rows:-null}}" >> "$ART"
  echo "[spot $(date +%H:%M:%S)] $q: $st (${dt}s)" | tee -a "$LOG"
  if [ $st = fail ] || [ $st = error ]; then tail -3 /tmp/spot_one.log | tee -a "$LOG"; fi
done
echo "[spot] done" | tee -a "$LOG"
