#!/bin/bash
# Generalized differential sweep at gen-sf<N> (VERDICT r09 item 7:
# extend the sweep a decade past sf3 on the cheap half of the suite).
# Usage: sweep_sfN.sh <sf> [extra-exclude ...]
#   sweep_sfN.sh 3
#   sweep_sfN.sh 10 q_unpivot q_resample_ffill ...
# Stage 0: derive the oracle-checked query list from THIS build via
#   Verify --sql-only (no Spark startup);
# Stage 1: Spark Verify dump of every oracle-checked query except the
#   exclusions; Stage 2: per-query DuckDB compare with a 300 s timeout
#   each so one expensive oracle can't hang the sweep.
# Standing exclusions (same set as the gen-sf1/sf3 sweeps, SURVEY §2.2):
#   q_graph_triangles            — deliberately unexecuted at sf>=1
#                                  (Θ(n³) on gendata's uniform density —
#                                  a SPARK-side wedge-space cost; the
#                                  sliced oracle can't fix the corpus)
#   q_embed_pairs, q_dedup_clusters, q_dedup_survivors, q_semantic_dedup
#                                — DuckDB oracle cost (quadratic SQL),
#                                  Spark sides fine
#   q_contamination, q_dedup_ngram — DuckDB n-gram joins > budget
# NO LONGER needed as sf>=10 extra-excludes (r16): q_pagerank,
# q_graph_degree, q_dedup_minhash_md5, q_embed_pairs_lsh — compare.py
# auto-routes them to the staged/sliced oracle past the measured
# thresholds (SLICED_ROUTE), so they compare fine at any decade.
# sf>=10 extra-exclude (r17): q_join_interval — its OUTPUT (the exact
# interval-overlap pair list) is quadratic by design, and the SPARK
# side's pair materialization spilled >33 GB to ENOSPC at gen-sf10;
# q_join_interval_agg (linear output, same banded join) is the
# corpus-scale form and stays swept. Pass it explicitly:
#   sweep_sfN.sh 10 q_join_interval
# First-time decades: pre-stage the sliced oracles so the 300 s/query
# compare budget holds (compare_sliced.py <sfDir> --stage-only <q>).
set -u
cd /root/repo
# Deliberate guard-cap raise (r19): the sweep box prices its own disk
# (the gen-sf30 co-supply stream measured 2.7 B rows / ~60 GB transient
# and PASSED with ~75 GB free) — the default SPARK_GRAFT_COOC_PAIR_CAP
# of 2e8 exists to protect runs that have NOT budgeted that. 4e9 admits
# the priced sf30 stream; sf100's ~9 B-row stream stays excluded (see
# the r19 adjudication in sweeps/sweep_spot_sf30.jsonl).
export SPARK_GRAFT_COOC_PAIR_CAP=${SPARK_GRAFT_COOC_PAIR_CAP:-4000000000}
SF=${1:?usage: sweep_sfN.sh <sf> [extra-exclude ...]}
shift
SF_DIR=/root/repo/gendata/sf$SF
OUT=/tmp/vout_sf$SF
LOG=/tmp/sweep_sf$SF.log
: > "$LOG"

EXCLUDE="q_graph_triangles q_embed_pairs q_dedup_clusters q_dedup_survivors q_semantic_dedup q_contamination q_dedup_ngram $*"

if [ ! -f "$SF_DIR/lineitem.parquet" ]; then
  echo "[sweep] FATAL: $SF_DIR not generated (run graft.tools.GenData first)" \
    | tee -a "$LOG"
  exit 1
fi

mkdir -p "$OUT"
sbt -batch "runMain graft.Verify $SF_DIR $OUT --sql-only" >> "$LOG" 2>&1
if [ ! -s "$OUT/oracle_sql.json" ]; then
  echo "[sweep] FATAL: $OUT/oracle_sql.json missing after --sql-only" \
    | tee -a "$LOG"
  exit 1
fi
ALL=$(python3 - "$OUT/oracle_sql.json" <<'EOF'
import json, sys
names = json.load(open(sys.argv[1]))
print(' '.join(sorted(names)))
EOF
)
RUN=""
for q in $ALL; do
  skip=0
  for e in $EXCLUDE; do [ "$q" = "$e" ] && skip=1; done
  [ $skip = 0 ] && RUN="$RUN $q"
done
echo "[sweep] dumping $(echo $RUN | wc -w) queries at sf$SF" | tee -a "$LOG"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF_DIR $OUT $RUN" \
  >> "$LOG" 2>&1
echo "[sweep] dump done, rc=$?" | tee -a "$LOG"
if [ -s "$OUT/errors.json" ] && [ "$(cat "$OUT/errors.json")" != "{}" ]; then
  echo "[sweep] DUMP FAILURES: $(cat "$OUT/errors.json")" | tee -a "$LOG"
fi

# stage 2: per-query compare with timeout (private temp file — two
# concurrent sweeps must not clobber each other's PASS/FAIL logging)
CMP=$(mktemp /tmp/cmp_one.XXXXXX)
trap 'rm -f "$CMP"' EXIT
PASS=0; FAIL=0; TIMEOUT=0
for q in $RUN; do
  if [ ! -d "$OUT/$q" ]; then
    echo "SKIP $q (no spark output)" | tee -a "$LOG"; FAIL=$((FAIL+1)); continue
  fi
  timeout "${CMP_TIMEOUT:-300}" python3 tools/compare.py "$SF_DIR" "$OUT" "$q" > "$CMP" 2>&1
  rc=$?
  if [ $rc = 124 ]; then
    echo "TIMEOUT $q (oracle > 300s)" | tee -a "$LOG"; TIMEOUT=$((TIMEOUT+1))
  elif grep -q "^PASS $q" "$CMP"; then
    echo "PASS $q" | tee -a "$LOG"; PASS=$((PASS+1))
  else
    echo "FAIL $q:" | tee -a "$LOG"
    grep "^FAIL" "$CMP" | head -2 | tee -a "$LOG"
    FAIL=$((FAIL+1))
  fi
done
echo "== sf$SF sweep: $PASS pass, $FAIL fail, $TIMEOUT oracle-timeout ==" | tee -a "$LOG"
