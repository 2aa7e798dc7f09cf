#!/bin/bash
# Model-contribution ablation (round-4 verdict item 3): the full
# 12-scene 5-config held-out protocol with ALL serving levers on but
# RANDOM-INIT weights (no checkpoint).  Bounds how much of r14c's
# 97.52% the trained model earns vs the host glue (hints, reconcile,
# template decode, fact line, COUNTS tally).  CPU-only — never touches
# the TPU — so it can run alongside a TPU training window.
#   levers: MSC_CLASSIFY_HINTS=1 (hint prompts), hint_reconcile and
#   mqa_template default ON since round 5.
# Untrained weights get json_length_bias=3.0 automatically
# (serving/client.py:366) — same terse-completion guard every
# untrained-model test uses.
cd "$(dirname "$0")/.."
export MSC_PLATFORM=cpu MSC_VLM_DTYPE=float32
export MSC_BACKEND=vlm MSC_CLASSIFY_HINTS=1
exec timeout 21600 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_untrained_levers
