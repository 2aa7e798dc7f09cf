#!/bin/bash
# Score a held-out eval results dir the canonical way (unified scorer,
# baseline overlay) so every round's table is produced identically:
#   scripts/score_heldout.sh evaluation_results/heldout_vlm_r12
# Prints per-config + per-question-family tables and renders the chart
# set into <dir>/visualizations/. CPU-only; never opens a TPU client.
set -eu
cd "$(dirname "$0")/.."

DIR=${1:?usage: score_heldout.sh <results dir> [baseline csv]}
BASE=${2:-$(ls evaluation_results/baseline_vlm_r11_cpu_full/baseline_results_*.csv | head -1)}
CSV=$(ls "$DIR"/mqa_results_*.csv | head -1)

MSC_PLATFORM=cpu python -m msc_tpu.eval.graphs "$CSV" --baseline-csv "$BASE"
