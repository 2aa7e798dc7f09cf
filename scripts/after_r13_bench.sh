#!/bin/bash
# r13 chain tail 2: when the r13 held-out eval exits, run the pipelined
# bench sweep — the round-4 throughput experiment the coalescing sweep
# (PERF.md) left open: cross-scene PIPELINING without row-coalescing
# (MSC_BENCH_COALESCE=0).  Each scene keeps its fused per-scene batches;
# N scene threads overlap host work while device work serializes through
# DEVICE_LOCK.  The new engine lock-split telemetry prints the ceiling.
# One TPU client at a time — this blocks on the eval wrapper's exit.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:?usage: after_r13_bench.sh <after_r13.sh pid>}
echo "waiting for r13 eval wrapper pid=$WAIT_PID ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "r13 eval finished at $(date); launching pipelined bench sweep"

OUT=evaluation_results/bench_r4_pipelined_$(date +%Y%m%d_%H%M%S)
mkdir -p "$OUT"
for C in 1 2 3; do
  echo "=== bench concurrency=$C coalesce=0 (pipelined) ===" \
    > "$OUT/bench_p${C}.log"
  MSC_BENCH_CONCURRENCY=$C MSC_BENCH_COALESCE=0 \
    timeout 1800 python bench.py >> "$OUT/bench_p${C}.log" 2>&1
  echo "bench c=$C rc=$? at $(date)"
done
echo "pipelined sweep done at $(date); logs in $OUT"
