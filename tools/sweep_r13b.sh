#!/bin/bash
# Round-13 follow-on: (1) the gen-sf30 spot-compare Spark dump,
# (2) the open-vocab SIXTH decade — ov-sf100 (5M docs), where unlike
# the closed corpus BOTH minhash verification sides should complete,
# extending the two-stage equality ladder to the decade the closed
# corpus could only run one-sided. DuckDB compares are NOT run here
# (spot_sf30.sh --compare-only does that afterwards, serialized away
# from any Spark run per the sweep playbook).
set -u
cd /root/repo
LOG=/tmp/sweep_r13b.log
: > "$LOG"
run() {
  echo "[r13b $(date +%H:%M:%S)] $*" | tee -a "$LOG"
  sbt -batch "$*" >> "$LOG" 2>&1
  echo "[r13b $(date +%H:%M:%S)] rc=$?" | tee -a "$LOG"
}

QS="q_sessionize q_scd2 q_resample_ffill q_cooccur_window \
q_window_analytic q_window_sliding q_window_rank q_window_tumbling \
q_join_salted q_join_asof_nearest q_rank_bm25"
run "runMain graft.Verify gendata/sf30 /tmp/vout_spot30 $QS"

if [ ! -f gendata/ov-sf100/documents.parquet ]; then
  run "runMain graft.tools.GenData gendata/ov-sf100 100 --open-vocab"
fi
run "runMain graft.tools.SlopeProbe gendata/ov-sf100 minhash --survivors"
run "runMain graft.tools.SlopeProbe gendata/ov-sf100 ngram"
run "runMain graft.tools.SlopeProbe gendata/ov-sf100 simhash --spaces-only"
run "runMain graft.tools.MinhashDiff gendata/ov-sf100"
echo "[r13b] done" | tee -a "$LOG"
