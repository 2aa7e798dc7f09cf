#!/bin/bash
# Pre-build the r15 distillation dataset on CPU into .dataset_cache so
# the TPU window is spent training, not constructing data.  Same build
# as run_r15.sh (hints + curriculum v3 + facts v3) — the cache key
# encodes all three discriminators.
cd "$(dirname "$0")/.."
export MSC_CLASSIFY_HINTS=1 MSC_CURRICULUM=v3 MSC_FACTS=v3
MSC_PLATFORM=cpu exec python - <<'PY'
from msc_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from msc_tpu.training.distill import build_multitask_dataset
t, e, h = build_multitask_dataset(160, holdout=12, tasks="all",
                                  config_names=("rotate",),
                                  cache_dir=".dataset_cache")
print(f"train={len(t)} eval={len(e)} holdout={h[:3]}..{h[-1]}")
PY
