#!/bin/bash
# Config sweep for the two-parallelism scaling gate (north_rule eff >= 0.8).
# Each variant runs scripts/scaling_evidence.py in a FRESH process (JVM opts
# are fixed at gateway launch).  Results append to $OUT as labeled JSON lines.
#
# Variants:
#   base       — engine defaults (reproduces the round-1 number)
#   offheap    — Tungsten off-heap memory (less GC at 16-way allocation rate)
#   nocompress — shuffle compression off (single-host disk, compression is pure CPU)
#   pinned     — taskset-confined to exactly N host CPUs per level + GC threads = N:
#                the faithful "cluster of size N" simulation; unpinned local[4]
#                borrows the other 28 host cores for GC/netty/compaction threads,
#                which contaminates the two-cluster-size comparison.
set -u
EDGES=${EDGES:-/tmp/spark_graft_scale_edges}
OUT=${OUT:-/tmp/sweep_results.jsonl}
REPS=${REPS:-2}
cd "$(dirname "$0")/.."

run() { # label cmd...
  local label=$1; shift
  echo "### $label: $*" >&2
  local t0=$SECONDS
  local json
  json=$("$@" 2>>/tmp/sweep_stderr.log | tail -1)
  echo "{\"variant\": \"$label\", \"wall_s\": $((SECONDS-t0)), \"result\": ${json:-null}}" >> "$OUT"
  echo "### $label done in $((SECONDS-t0))s -> $json" >&2
}

case ${1:-all} in
base|all)
  run base python scripts/scaling_evidence.py "$EDGES" 4 16 "$REPS"
  ;;&
offheap|all)
  SPARK_GRAFT_SCALE_CONF='{"spark.memory.offHeap.enabled":"true","spark.memory.offHeap.size":"16g"}' \
    run offheap python scripts/scaling_evidence.py "$EDGES" 4 16 "$REPS"
  ;;&
nocompress|all)
  SPARK_GRAFT_SCALE_CONF='{"spark.shuffle.compress":"false","spark.shuffle.spill.compress":"false"}' \
    run nocompress python scripts/scaling_evidence.py "$EDGES" 4 16 "$REPS"
  ;;&
pinned|all)
  # level-pinned processes, interleaved in time like the in-process harness
  for rep in $(seq 1 "$REPS"); do
    SPARK_GRAFT_SCALE_JAVAOPTS='-XX:+UseParallelGC -XX:ParallelGCThreads={cores}' \
      run "pinned4_r$rep" taskset -c 0-3 python scripts/scaling_evidence.py "$EDGES" 4 4 1
    SPARK_GRAFT_SCALE_JAVAOPTS='-XX:+UseParallelGC -XX:ParallelGCThreads={cores}' \
      run "pinned16_r$rep" taskset -c 0-15 python scripts/scaling_evidence.py "$EDGES" 16 16 1
  done
  ;;
esac
echo "sweep done" >&2
