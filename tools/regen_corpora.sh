#!/bin/bash
# Regenerate the synthetic scale corpora (VERDICT r15 item 3): GenData
# is byte-deterministic (xxhash64-derived columns, partitioning-
# independent — GenDataSpec), so any deleted decade is "one run away".
# This script is that run, one command per corpus family.
#
# Usage: tools/regen_corpora.sh <gen|ov|pl> <sf> [outRoot=gendata]
#   gen <sf> → gendata/sf<sf>      all ten tables (uniform TPC-H-ish)
#   ov  <sf> → gendata/ov-sf<sf>   documents only (open-vocab Zipf;
#                                  the dedup/text-family sweep corpus)
#   pl  <sf> → gendata/pl-sf<sf>   orders+lineitem only (power-law
#                                  trade graph; the graph-family corpus)
#
# Disk budget (zstd parquet, measured on past runs):
#   gen: ~175 MB/sf on disk (sf3 484M, sf10 1.8G, sf30 5.3G, sf100
#        ~18G) + transient blockmgr spill during gen (~30 GB at sf100,
#        ~30 min at local[16]; sf30 ~13 min).
#   pl:  ~150 MB/sf (pl-sf100 ~14G). The GENERATION is cheap; it is
#        downstream dumps that need headroom (pl-sf100 projection dump
#        needed ~60 GB transient — see memory/scale-sweep-playbook).
#   ov:  documents only, a fraction of gen (all four decades ov-sf3..100
#        fit in a few GB total).
# After any large run, check for an orphaned /tmp/blockmgr-* left by a
# JVM that exited uncleanly.
set -eu
cd "$(dirname "$0")/.."
family=${1:?usage: regen_corpora.sh <gen|ov|pl> <sf> [outRoot]}
sf=${2:?usage: regen_corpora.sh <gen|ov|pl> <sf> [outRoot]}
root=${3:-gendata}
case "$family" in
  gen) out="$root/sf$sf";    flags="";;
  ov)  out="$root/ov-sf$sf"; flags="--open-vocab";;
  pl)  out="$root/pl-sf$sf"; flags="--power-law";;
  *) echo "unknown family '$family' (gen|ov|pl)"; exit 2;;
esac
echo "[regen] $family sf=$sf -> $out"
env SPARK_GRAFT_MASTER=local[16] \
  sbt -batch "runMain graft.tools.GenData $out $sf $flags"
du -sh "$out"
