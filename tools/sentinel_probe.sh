#!/bin/bash
# Drift-sentinel probe — the STANDING protocol of SCALE.md §"Drift
# sentinels": a fixed ≤60 s 4-row set measured at round START (previous
# round's code, before any change) and round END (final code), so board
# deltas are stated against box anchors. $1 = tag (start|end).
# Writes /tmp/sentinel_<tag>_{sf01,100x}.json; commit the readings to
# SCALE.md every round.
#
# Rows: q41/q117/q130 at sf0.1 (CPU-bound batch axes, 2x2 min protocol)
# and q198 at the 100x corpus (streaming/RocksDB lifecycle axis, 1x2).
# The 100x corpus is the ScaleProbe output at /tmp/graft-scale100 —
# regenerate it first if the box was wiped.
set -euo pipefail
cd /root/repo
TAG=${1:-}
case "$TAG" in
  start|end) ;;
  *) echo "usage: $0 start|end" >&2; exit 1 ;;
esac
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_QUERIES=q41,q117,q130 SPARK_GRAFT_BENCH_PREBUILD=dedup \
  SPARK_GRAFT_BENCH_OUT=/tmp/sentinel_${TAG}_sf01.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
SPARK_GRAFT_SF_DIR=/tmp/graft-scale100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_QUERIES=q198 SPARK_GRAFT_BENCH_PREBUILD=stream \
  SPARK_GRAFT_BENCH_ROUNDS=1 SPARK_GRAFT_BENCH_REPS=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/sentinel_${TAG}_100x.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
