#!/bin/bash
# Round-5 follow-up: block-decode bench A/B WITH the Pallas flash block
# attention (ops/block_attention.py).  The first A/B showed the XLA
# block step costs ~4x a plain step (score-tensor materialization);
# this measures whether the kernel recovers the speculation win.
# Usage: bench_blockdec_flash.sh [pid to wait for]
set -u
cd "$(dirname "$0")/.."

if [ $# -ge 1 ]; then
  echo "waiting for pid=$1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "chip free at $(date)"

echo "=== bench MSC_BLOCK_DECODE=1 + flash kernel (warmup: compiles) ==="
MSC_BLOCK_DECODE=1 timeout 3600 python bench.py 2>&1 | tail -8
echo "=== bench MSC_BLOCK_DECODE=1 + flash kernel (warm) ==="
MSC_BLOCK_DECODE=1 timeout 1800 python bench.py 2>&1 | tail -8
echo "=== control (block decode off, warm) ==="
timeout 1800 python bench.py 2>&1 | tail -8
echo "flash bench A/B done at $(date)"
