#!/bin/bash
# r13 = the r12 recipe + the two round-4 prompt levers, retrained from
# scratch at the full 26000-step cosine schedule:
#   MSC_CLASSIFY_HINTS=1 — host geometry hint in every classify prompt
#     ("Geometry suggests: ..."), computed by the same rule the analytic
#     teacher answers with, so cluster classification becomes retrieval
#     for the student (round-4 held-out decomposition: 128/313 failures
#     were wrong facts from student misclassification, RESULTS.md).
#   MSC_CURRICULUM=v2 — camera/distance/location fact-copy pairs (the
#     weakest read families: the model contradicts a correct fact line
#     on ~48/58 of their rows).
# s-family throughput is ~6.3 steps/s on one v5e (r12: 26000 steps in
# ~69 min), so the full schedule completes comfortably in one window.
# Dataset cache ds_all_rotate_160_12_1_224_hints_cur2.pkl is prebuilt.
cd "$(dirname "$0")/.."
export MSC_CLASSIFY_HINTS=1 MSC_CURRICULUM=v2
export MSC_DATASET_CACHE=.dataset_cache
exec python -m msc_tpu.tools.watchdog \
  --log /tmp/r13.log --stall-minutes 20 --max-restarts 30 -- \
  python -m msc_tpu.training.distill \
    --tasks all --configs rotate --scenes 160 --holdout 12 \
    --steps 26000 --preset msc-vlm-s --batch 8 \
    --save ckpt/distill_r13 --save-every 1000 --resume
