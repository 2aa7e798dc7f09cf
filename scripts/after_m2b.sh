#!/bin/bash
# Round-4 chain, rebuilt tail (VERDICT #4): when the rescheduled
# msc-vlm-m training watchdog exits, run the m-family 12-scene held-out
# eval, then the m-family bench row.  One TPU client at a time
# throughout; detach with setsid so artifacts land even if the builder
# session dies.
set -u
cd "$(dirname "$0")/.."

WATCH_PID=${1:?usage: after_m2b.sh <run_m2b watchdog pid>}
echo "waiting for m2b watchdog pid=$WATCH_PID ..."
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 20; done
echo "m2b training finished at $(date); launching m-family held-out eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_m2 \
  timeout 7200 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_m2
echo "m eval rc=$? at $(date); benching m family"

STAMP=$(date +%Y%m%d_%H%M%S)
OUT=evaluation_results/bench_m_$STAMP
mkdir -p "$OUT"
MSC_VLM_CKPT=ckpt/distill_m2 MSC_BENCH_SCENES=12 \
  timeout 3600 python bench.py > "$OUT/bench_m_c1.log" 2>&1
echo "m bench rc=$? at $(date)"
tail -1 "$OUT/bench_m_c1.log"
