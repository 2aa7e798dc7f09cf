"""Device mesh + sharding rules.

The reference has zero parallelism (SURVEY.md section 2.3) — every axis
here is new, TPU-first design:

- mesh axes ``("data", "model")``: data parallelism over scenes/samples
  (the ablation runner's natural batch axis) x tensor parallelism over
  attention heads / MLP hidden of the VLM;
- shardings are ``NamedSharding`` trees over the parameter pytrees; XLA
  GSPMD inserts the all-reduce/all-gather collectives over ICI.

Sequence/expert parallelism hooks: the axis list is open — a ``seq`` axis
for ring-attention prefill sharding and an ``expert`` axis for MoE
decoders slot in here when those model families land.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msc_tpu.config import MeshConfig


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh.  data*model must equal the device count
    (pass devices explicitly to use a subset)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _dec_layer_specs() -> Dict[str, P]:
    """Tensor-parallel partition specs for one decoder layer: attention
    heads and MLP hidden shard over ``model``; residual-dim axes stay
    replicated so layernorms need no collectives."""
    return {
        "ln1": P(), "ln2": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
    }


def _vit_block_specs() -> Dict[str, P]:
    return {
        "ln1": {"scale": P(), "bias": P()},
        "ln2": {"scale": P(), "bias": P()},
        "wqkv": P(None, "model"), "bqkv": P("model"),
        "wo": P("model", None), "bo": P(),
        "w1": P(None, "model"), "b1": P("model"),
        "w2": P("model", None), "b2": P(),
    }


def vlm_param_specs(params: Dict) -> Dict:
    """PartitionSpec tree matching ``init_vlm_params`` output."""
    dec = params["dec"]
    vit = params["vit"]
    return {
        "dec": {
            "embed": P(),          # replicated (tied LM head)
            "ln_f": P(),
            "img_proj": P(),
            "layers": [_dec_layer_specs() for _ in dec["layers"]],
        },
        "vit": {
            "patch_proj": P(), "patch_bias": P(), "pos_embed": P(),
            "ln_f": {"scale": P(), "bias": P()},
            "blocks": [_vit_block_specs() for _ in vit["blocks"]],
        },
    }


def make_vlm_shardings(params: Dict, mesh: Mesh) -> Any:
    """NamedSharding tree for the VLM parameter pytree."""
    specs = vlm_param_specs(params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place a parameter pytree onto the mesh with TP shardings."""
    sh = make_vlm_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading sharding for inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
