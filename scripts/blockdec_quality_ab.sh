#!/bin/bash
# Block-decode QUALITY A/B (round-5): the full 5-config 12-scene
# held-out protocol on CPU with MSC_BLOCK_DECODE=1 under the shipped
# checkpoint + production levers.  Greedy free-text block decode is
# token-identical by construction (tests/test_block_decode.py); the
# CONSTRAINED path may take a different token segmentation through the
# DFA, so text can differ — this sweep proves the differences don't
# cost held-out accuracy vs the r14c row (97.52%).
# CPU-only, never touches the TPU, but the host has ONE vCPU: run only
# when no TPU training/eval is feeding from this host.
# Score afterwards: scripts/score_heldout.sh evaluation_results/heldout_vlm_r14c_blockdec
cd "$(dirname "$0")/.."
export MSC_PLATFORM=cpu MSC_VLM_DTYPE=float32
export MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r14 MSC_BLOCK_DECODE=1
exec timeout 21600 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --output-dir evaluation_results/heldout_vlm_r14c_blockdec
