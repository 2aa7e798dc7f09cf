#!/bin/bash
# r14b = re-measure ONLY the two lidar-detection legs of the r14
# held-out eval with hint reconciliation on (MSC_HINT_RECONCILE=1):
# the confident geometry rule overrides the model's parsed classify
# category (agents/lidar.py _reconcile_with_geometry).  Targets the
# 93 lidar_only wrong-fact failures of the r13 decomposition — captions
# reporting 0 of objects the rule detects.  The other three configs
# (full, cams_annotations, all_cams) don't consume lidar detections
# for facts (OBJECTS beats DETECTIONS), so their r14 rows stand.
# Run AFTER the r14 chain releases the chip; one TPU client at a time.
set -u
cd "$(dirname "$0")/.."
MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_r14 MSC_HINT_RECONCILE=1 \
  timeout 4000 python -m msc_tpu.eval.runner --test-mode \
    --num-scenes 12 --scene-offset 148 --mock-scenes 160 \
    --configs lidar_only,cams_lidar \
    --output-dir evaluation_results/heldout_vlm_r14b_reconcile
echo "r14b eval rc=$? at $(date)"
