#!/bin/bash
# r13 chain tail: when the r13 training watchdog exits, run the full
# 12-scene held-out eval of the new checkpoint on the chip.  One TPU
# client at a time — this blocks on the trainer's exit.  The pipeline
# reads ckpt/distill_r13.flags and serves hint-bearing classify prompts
# automatically (the format the checkpoint was trained on).
set -u
cd "$(dirname "$0")/.."

WATCH_PID=${1:?usage: after_r13.sh <run_r13 watchdog pid>}
echo "waiting for r13 watchdog pid=$WATCH_PID ..."
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 20; done
echo "r13 training finished at $(date); launching held-out eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r13 \
  timeout 5400 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r13
echo "eval rc=$? at $(date)"
