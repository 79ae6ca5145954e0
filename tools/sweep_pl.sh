#!/bin/bash
# Power-law graph-family sweep (VERDICT r14 item 1 — the tool r14 built
# and never ran): dump q_pagerank / q_graph_triangles / q_graph_degree
# at each gendata/pl-sf* dir passed, DuckDB-compare each (cell-exact at
# pl-sf3/10; order-independent checksum — COMPARE_HASH_ROWS=1 — at
# pl-sf30, where the cell-exact path would execute the heavy projection
# oracle twice via the count bound), append PASS/FAIL rows to
# sweeps/sweep_spot_sf30.jsonl, then record the SlopeProbe `graph`
# analytics (distinct co-occurring pairs vs n_supp — the ~linear-growth
# record) to sweeps/sweep_graph.jsonl.
#
# Run AFTER any bench — a spilling oracle can fill the disk under a
# concurrent Spark run (playbook: three r10 bench "failures").
#
# Usage: tools/sweep_pl.sh gendata/pl-sf3 gendata/pl-sf10 gendata/pl-sf30
set -u
cd /root/repo
QS="q_pagerank q_graph_triangles q_graph_degree"
ART=sweeps/sweep_spot_sf30.jsonl
LOG=/tmp/sweep_pl.log
mkdir -p sweeps
for dir in "$@"; do
  name=$(basename "$dir")
  OUT=/tmp/vout_$name
  # ≥sf30: 256 shuffle partitions per the per-decade sizing (playbook /
  # Sessions scaladoc); smaller decades keep the auto heuristic.
  case $name in
    *sf30*|*sf100*) parts=256; hashrows=1; budget=5400;;
    *)              parts=;    hashrows=20000000; budget=1800;;
  esac
  echo "[pl $(date +%H:%M:%S)] dumping $dir (parts=${parts:-auto})" | tee -a "$LOG"
  env SPARK_GRAFT_CPUS=16 ${parts:+SPARK_GRAFT_SHUFFLE_PARTS=$parts} \
    sbt -batch "runMain graft.Verify $dir $OUT $QS" >> "$LOG" 2>&1
  echo "[pl] dump rc=$?" | tee -a "$LOG"
  for q in $QS; do
    if [ ! -d "$OUT/$q" ]; then
      echo "{\"sf\":\"$dir\",\"query\":\"$q\",\"status\":\"no_dump\"}" >> "$ART"
      continue
    fi
    t0=$(date +%s)
    COMPARE_HASH_ROWS=$hashrows timeout "$budget" \
      python3 tools/compare.py "$dir" "$OUT" "$q" > /tmp/pl_one.log 2>&1
    rc=$?
    dt=$(( $(date +%s) - t0 ))
    if [ $rc = 124 ]; then st=oracle_timeout
    elif grep -q "^PASS $q" /tmp/pl_one.log; then st=pass
    elif grep -q "^FAIL $q" /tmp/pl_one.log; then st=fail
    else st=error; fi
    cmp=cell_exact
    grep -q "hash comparator" /tmp/pl_one.log && cmp=hash
    rows=$(grep -oE "\(([0-9]+) rows" /tmp/pl_one.log | grep -oE "[0-9]+" | head -1)
    echo "{\"sf\":\"$dir\",\"query\":\"$q\",\"status\":\"$st\",\"sec\":$dt,\"rows\":${rows:-null},\"comparator\":\"$cmp\"}" >> "$ART"
    echo "[pl $(date +%H:%M:%S)] $name/$q: $st (${dt}s, $cmp)" | tee -a "$LOG"
    if [ $st = fail ] || [ $st = error ]; then tail -3 /tmp/pl_one.log | tee -a "$LOG"; fi
  done
  echo "[pl $(date +%H:%M:%S)] SlopeProbe graph @ $dir" | tee -a "$LOG"
  env SPARK_GRAFT_CPUS=16 ${parts:+SPARK_GRAFT_SHUFFLE_PARTS=$parts} \
    sbt -batch "runMain graft.tools.SlopeProbe $dir graph" >> "$LOG" 2>&1
  echo "[pl] probe rc=$?" | tee -a "$LOG"
done
echo "[pl] done" | tee -a "$LOG"
