#!/bin/bash
# msc-vlm-m training, rescheduled (round-4 correction): the original
# run_m1.sh asked for 26000 steps, but measured m-family throughput is
# ~1.07 steps/s on one v5e — a 3.2 h cap cuts that schedule at ~47%,
# mid-cosine-decay, which is exactly the r11@15000 failure (garbled
# rare families; RESULTS.md round 3).  A schedule that COMPLETES inside
# the budget beats an interrupted long one (r12-vs-r11 evidence), so:
# --steps 12000 (~2.8 h from the step-1500 resume point), same
# hyperparameters otherwise.  --resume restores params+optimizer+step
# from ckpt/distill_m2__state; optax evaluates the new schedule at the
# restored step count, so the LR trajectory is consistent.
cd "$(dirname "$0")/.."
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/m2b.log --stall-minutes 20 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 12000 --preset msc-vlm-m --batch 8 \
    --save ckpt/distill_m2 --save-every 500 --resume
