#!/bin/bash
# r14 chain: wait for the pipelined bench sweep to release the chip,
# launch r14 training (see run_r14.sh), then on its watchdog's exit run
# the full 12-scene held-out eval.  One TPU client at a time.
set -u
cd "$(dirname "$0")/.."

WAIT_PID=${1:?usage: after_r14.sh <pid to wait for before training>}
echo "waiting for pid=$WAIT_PID (bench sweep) ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "chip free at $(date); launching r14 training"

setsid nohup bash scripts/run_r14.sh > /tmp/r14_outer.log 2>&1 < /dev/null &
sleep 5
WD=$(pgrep -f "watchdog --log /tmp/r14.log" | head -1)
echo "r14 watchdog pid=$WD"
while [ -n "$WD" ] && kill -0 "$WD" 2>/dev/null; do sleep 30; done
echo "r14 training finished at $(date); launching held-out eval"

MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r14 \
  timeout 5400 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r14
echo "r14 eval rc=$? at $(date)"
