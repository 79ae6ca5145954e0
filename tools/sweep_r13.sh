#!/bin/bash
# Round-13 evidence sweep (VERDICT r12 items 1-3): every number the
# SURVEY §6.1 two-stage-minhash + open-vocab records cite, produced by
# the de-biased tools and left as JSONL artifacts in sweeps/ (SweepLog).
#
#  stage A  MinhashDiff equality+timing ladder: testdata sf0.1, gen-sf3,
#           gen-sf10, gen-sf30 (both sides, symmetric cleared-cache
#           walls); gen-sf100 two-stage-only (single-stage IS the
#           ~600 GB ENOSPC the two-stage fix retired)
#  stage B  SlopeProbe minhash --survivors per decade (prefilter
#           survivors must track output pairs, not the band space)
#  stage C  GenData --open-vocab at sf3/sf10/sf30 + the dedup-family
#           probes on the open-vocab corpora (minhash/simhash/ngram
#           candidate spaces + MinhashDiff at ov-sf10/ov-sf30)
#
# Stages are sequential (one Spark JVM at a time; the box has 32 cores
# and the probes size their own shuffles via Sessions.shuffleParts).
set -u
cd /root/repo
LOG=/tmp/sweep_r13.log
: > "$LOG"
run() {
  echo "[r13 $(date +%H:%M:%S)] $*" | tee -a "$LOG"
  sbt -batch "$*" >> "$LOG" 2>&1
  echo "[r13 $(date +%H:%M:%S)] rc=$?" | tee -a "$LOG"
}

# stage A — differential ladder
run "runMain graft.tools.MinhashDiff /root/testdata/sf0.1"
run "runMain graft.tools.MinhashDiff gendata/sf3"
run "runMain graft.tools.MinhashDiff gendata/sf10"
run "runMain graft.tools.MinhashDiff gendata/sf30"
run "runMain graft.tools.MinhashDiff gendata/sf100 --two-stage-only"

# stage B — survivor slopes
run "runMain graft.tools.SlopeProbe gendata/sf3 minhash --survivors"
run "runMain graft.tools.SlopeProbe gendata/sf10 minhash --survivors"
run "runMain graft.tools.SlopeProbe gendata/sf30 minhash --survivors"
run "runMain graft.tools.SlopeProbe gendata/sf100 minhash --survivors"

# stage C — open-vocab corpora + dedup-family probes on them
for sf in 3 10 30; do
  if [ ! -f "gendata/ov-sf$sf/documents.parquet" ]; then
    run "runMain graft.tools.GenData gendata/ov-sf$sf $sf --open-vocab"
  fi
done
for sf in 3 10 30; do
  run "runMain graft.tools.SlopeProbe gendata/ov-sf$sf minhash --survivors"
  run "runMain graft.tools.SlopeProbe gendata/ov-sf$sf simhash"
  run "runMain graft.tools.SlopeProbe gendata/ov-sf$sf ngram"
done
run "runMain graft.tools.MinhashDiff gendata/ov-sf10"
run "runMain graft.tools.MinhashDiff gendata/ov-sf30"

echo "[r13] sweep done; artifacts:" | tee -a "$LOG"
ls -la sweeps/ | tee -a "$LOG"
