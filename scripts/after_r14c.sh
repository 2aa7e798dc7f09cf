#!/bin/bash
# r14c = the production serving configuration measured: r14 weights +
# BOTH round-4 serving levers on (MSC_HINT_RECONCILE=1 geometry-rule
# override of parsed classify categories; MSC_MQA_TEMPLATE=1
# template-constrained MQA decoding).  Full 5-config 12-scene held-out
# sweep so the table is directly comparable to r12/r13/r14.  Waits for
# the r14 chain to release the chip first.  One TPU client at a time.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:?usage: after_r14c.sh <pid to wait for>}
echo "waiting for pid=$WAIT_PID (r14 chain) ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "chip free at $(date); launching r14c eval (reconcile+template)"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r14 \
MSC_HINT_RECONCILE=1 MSC_MQA_TEMPLATE=1 \
  timeout 7200 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r14c
echo "r14c eval rc=$? at $(date)"
