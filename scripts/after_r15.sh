#!/bin/bash
# After r15 training completes: two full 5-config 12-scene held-out
# sweeps back to back —
#   1. r15 PRODUCTION config (levers default ON since round 5): the
#      ship candidate, directly comparable to r14c's 97.52%.
#   2. r15 UNASSISTED (MSC_HINT_RECONCILE=0 MSC_MQA_TEMPLATE=0): the
#      round-4 verdict's standing "unassisted eval row per round" —
#      measures the raw model (bar: lidar_only >= 60%).
# Waits for the training watchdog pid to exit first.  One TPU client at
# a time.  Usage: after_r15.sh <watchdog pid>
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:?usage: after_r15.sh <pid to wait for>}
echo "waiting for pid=$WAIT_PID (r15 training) ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "chip free at $(date); launching r15 production eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r15 \
  timeout 7200 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r15
echo "r15 production eval rc=$? at $(date); launching unassisted eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r15 \
MSC_HINT_RECONCILE=0 MSC_MQA_TEMPLATE=0 \
  timeout 7200 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r15_unassisted
echo "r15 unassisted eval rc=$? at $(date)"
