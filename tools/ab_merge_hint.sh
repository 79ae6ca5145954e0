#!/bin/bash
# Merge-hint calm-window A/B at gate scale (VERDICT r11 item 3 / r12
# item 4): 3 full-suite Bench runs with the pair-join hint("merge")
# lines active (the shipped configuration) interleaved with 3 runs with
# them neutralized (SPARK_GRAFT_NO_MERGE_HINT=1, graft.Hints kill
# switch). Interleaving A/B/A/B/A/B instead of AAABBB so slow host
# drift hits both arms equally. Each line of the artifact records the
# arm, the suite total, and the calib scalar for host-normalization.
set -u
cd /root/repo
LOG=/tmp/ab_merge_hint.log
OUT=sweeps/sweep_merge_hint_ab.jsonl
: > "$LOG"
mkdir -p sweeps
for i in 1 2 3; do
  for arm in on off; do
    if [ "$arm" = off ]; then env="SPARK_GRAFT_NO_MERGE_HINT=1"; else env=""; fi
    echo "[ab $(date +%H:%M:%S)] run $i arm=$arm" | tee -a "$LOG"
    line=$(env $env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>>"$LOG" | grep '"metric"' | tail -1)
    if [ -z "$line" ]; then
      echo "[ab] run $i arm=$arm produced no metric line" | tee -a "$LOG"
      continue
    fi
    echo "{\"arm\":\"$arm\",\"run\":$i,\"bench\":$line}" >> "$OUT"
    echo "[ab] $(echo "$line" | python3 -c 'import json,sys; d=json.load(sys.stdin); print(d["value"], d.get("calib"))')" | tee -a "$LOG"
  done
done
echo "[ab] done" | tee -a "$LOG"
