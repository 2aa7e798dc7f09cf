#!/bin/bash
# r14 = the r13 recipe at the CORRECT batch size.  run_r13.sh passed
# --batch 8 (copied from the m-family script, where 8 is an HBM
# constraint); r12 and every prior s-family run trained at the default
# 16.  r13 therefore saw HALF the samples (208k vs 416k; ~11.7 epochs)
# and the multi-count copy circuit never formed: on in-distribution val
# pairs with <cnt>>=2 targets, r13 answers <cnt>1</cnt> on 6/6 while r12
# answers 5/6 correctly (measured 2026-08-19).  Held-out signature:
# count_scene 39.5% (r12: 61.5%) with NO prediction above cnt=1, while
# the r13 levers themselves worked (distance 74->100%, count_camera
# 66->77%, cams_lidar wrong-facts 55->0).
#   MSC_CLASSIFY_HINTS=1  — host geometry hint in every classify prompt
#   MSC_CURRICULUM=v2     — camera/distance/location fact-copy pairs
# Dataset cache ds_all_rotate_160_12_1_224_hints_cur2.pkl is prebuilt
# (batch-independent).  ~69 min at ~6.3 steps/s on one v5e.
cd "$(dirname "$0")/.."
export MSC_CLASSIFY_HINTS=1 MSC_CURRICULUM=v2
export MSC_DATASET_CACHE=.dataset_cache
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/r14.log --stall-minutes 20 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 26000 --preset msc-vlm-s --batch 16 \
    --save ckpt/distill_r14 --save-every 1000 --resume
