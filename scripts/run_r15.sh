#!/bin/bash
# r15 = the r14 recipe + fact-line v3 + curriculum v3, targeting the two
# round-4 verdict gaps the serving levers currently mask:
#   * tag-content: after r14's v2 schedule the nearest-payload copy
#     circuit never formed (round-5 probe: 0/9 slot copies on fresh
#     synthetic prompts; mode-collapsed values).  MSC_FACTS=v3 restates
#     the fact line so each family's answer value is the FIRST value
#     after the colon — the positional motif the count circuit formed
#     on — and MSC_CURRICULUM=v3 doubles the tag-family sample draw.
#   * unassisted lidar_only (45.71% raw r14): the absent-form answer
#     branches are now reachable under the template automata, and the
#     v3 tag pairs train them explicitly.
#   MSC_CLASSIFY_HINTS=1  — host geometry hint in every classify prompt
# Dataset cache ds_all_rotate_160_12_1_224_hints_cur3_facts3.pkl must be
# prebuilt on CPU first (scripts/prebuild_dataset_r15.sh).
# ~70 min at ~6.3 steps/s on one v5e (r14 measured).
cd "$(dirname "$0")/.."
export MSC_CLASSIFY_HINTS=1 MSC_CURRICULUM=v3 MSC_FACTS=v3
export MSC_DATASET_CACHE=.dataset_cache
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/r15.log --stall-minutes 20 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 26000 --preset msc-vlm-s --batch 16 \
    --save ckpt/distill_r15 --save-every 1000 --resume
