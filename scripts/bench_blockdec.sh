#!/bin/bash
# Block-decode TPU bench A/B (round-5 VERDICT item 2).  Waits for the
# after_r15 eval chain to free the chip, then:
#   1. warms the block-decode compile set + measures bench with
#      MSC_BLOCK_DECODE=1 (two runs: first pays compiles, second is the
#      number);
#   2. one control run with block decode off (should reproduce ~1.52).
# One TPU client at a time.  Usage: bench_blockdec.sh <pid to wait for>
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:?usage: bench_blockdec.sh <pid to wait for>}
echo "waiting for pid=$WAIT_PID (after_r15 evals) ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "chip free at $(date)"

echo "=== bench MSC_BLOCK_DECODE=1 (warmup: compiles) ==="
MSC_BLOCK_DECODE=1 timeout 3600 python bench.py 2>&1 | tail -12
echo "=== bench MSC_BLOCK_DECODE=1 (warm) ==="
MSC_BLOCK_DECODE=1 timeout 1800 python bench.py 2>&1 | tail -12
echo "=== bench control (block decode off) ==="
timeout 1800 python bench.py 2>&1 | tail -12
echo "bench A/B done at $(date)"
