#!/bin/bash
# Round-4 distillation run (VERDICT #1): r12 to FULL schedule completion
# under the committed stall watchdog. The watchdog relaunches with
# --resume, which restores params+optimizer+step from
# ckpt/distill_r12__state (written every --save-every steps), so a
# tunnel stall costs at most 1000 steps.
#
# Protocol identical to RESULTS.md: 160 mock scenes, 12 held out,
# per-scene ablation-config rotation, all agent tasks.
cd "$(dirname "$0")/.."
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/r12.log --stall-minutes 15 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 26000 --save ckpt/distill_r12 --save-every 1000 --resume
