#!/bin/bash
# Round-4 chain, link 3 (VERDICT #4): when the m-family eval exits,
# take the m-family bench row (the "latency cost" half of the A/B),
# then a final s-family bench with the round-4 shipped checkpoint so
# BENCH_r04 conditions are reproduced in-tree.
set -u
cd "$(dirname "$0")/.."

PREV_PID=${1:?usage: after_m1_bench.sh <after_eval_m1.sh pid>}
echo "waiting for m1 chain pid=$PREV_PID ..."
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
echo "m1 chain done at $(date); benching m family"

STAMP=$(date +%Y%m%d_%H%M%S)
OUT=evaluation_results/bench_m_$STAMP
mkdir -p "$OUT"
MSC_VLM_CKPT=ckpt/distill_m2 MSC_BENCH_SCENES=12 \
  timeout 3600 python bench.py > "$OUT/bench_m_c1.log" 2>&1
echo "m bench rc=$?"
tail -1 "$OUT/bench_m_c1.log"
