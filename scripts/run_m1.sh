#!/bin/bash
# msc-vlm-m training (VERDICT #4): the 8x family member, unblocked by
# query-chunked remat attention. Same protocol as run_r12.sh.
cd "$(dirname "$0")/.."
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/m1.log --stall-minutes 20 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 26000 --preset msc-vlm-m --batch 8 \
    --save ckpt/distill_m2 --save-every 500 --resume
