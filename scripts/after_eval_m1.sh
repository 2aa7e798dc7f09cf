#!/bin/bash
# Round-4 chain, link 2 (VERDICT #4): when the r12 held-out eval exits,
# train msc-vlm-m (bounded; --save-every 500 makes any cutoff resumable)
# and then run ITS held-out eval. One TPU client at a time throughout.
set -u
cd "$(dirname "$0")/.."

EVAL_PID=${1:?usage: after_eval_m1.sh <after_r12.sh pid>}
echo "waiting for r12 eval chain pid=$EVAL_PID ..."
while kill -0 "$EVAL_PID" 2>/dev/null; do sleep 20; done
echo "r12 eval chain done at $(date); launching msc-vlm-m training"

timeout 11520 scripts/run_m1.sh
echo "m1 training rc=$? at $(date); launching m-family held-out eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_m2 \
  timeout 7200 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_m2
echo "m eval rc=$? at $(date)"
