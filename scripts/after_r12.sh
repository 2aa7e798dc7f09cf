#!/bin/bash
# Round-4 chain (VERDICT #1, second half): the moment the r12
# distillation watchdog exits, run the FULL 12-scene held-out eval of
# the new checkpoint on the chip (one TPU client at a time — this
# blocks on the trainer's exit, never overlaps it).
#
# Detach with setsid so the eval lands even if the builder session dies
# (round-4 sessions were repeatedly killed by infra; artifacts must not
# depend on the session surviving).
set -u
cd "$(dirname "$0")/.."

WATCH_PID=${1:?usage: after_r12.sh <watchdog pid>}
echo "waiting for r12 watchdog pid=$WATCH_PID ..."
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 20; done
echo "r12 training finished at $(date); launching held-out eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r12 \
  timeout 5400 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r12
echo "eval rc=$? at $(date)"
