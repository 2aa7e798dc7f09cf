#!/bin/bash
# Round-4 TPU window plan (VERDICT #2, #7, then #1): run the moment the
# chip is reachable, in this order:
#   1. bench at concurrency 1 (the headline number, fused path on)
#   2. concurrency sweep 2 / 4 (ContinuousBatcher + parallel Layer-1)
#   3. r12 distillation to schedule completion under the watchdog
# One TPU client at a time: each stage runs strictly after the previous.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date +%Y%m%d_%H%M%S)
OUT=evaluation_results/bench_r4_$STAMP
mkdir -p "$OUT"

echo "=== bench concurrency=1 ===" | tee "$OUT/bench_c1.log"
MSC_BENCH_SCENES=24 timeout 3600 python bench.py >> "$OUT/bench_c1.log" 2>&1
tail -1 "$OUT/bench_c1.log"

for C in 2 4; do
  echo "=== bench concurrency=$C ===" | tee "$OUT/bench_c$C.log"
  MSC_BENCH_SCENES=24 MSC_BENCH_CONCURRENCY=$C MSC_BENCH_PARALLEL_L1=1 \
    timeout 3600 python bench.py >> "$OUT/bench_c$C.log" 2>&1
  tail -1 "$OUT/bench_c$C.log"
done

echo "=== r12 training ==="
exec scripts/run_r12.sh
