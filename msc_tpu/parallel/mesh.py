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


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[list] = None,
              expert: int = 1) -> Mesh:
    """Build a (data, model[, expert]) mesh.  The axis product must equal
    the device count (pass devices explicitly to use a subset)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert data * model * expert == n, \
        f"mesh {data}x{model}x{expert} != {n} devices"
    if expert > 1:
        arr = np.asarray(devices).reshape(data, model, expert)
        return Mesh(arr, ("data", "model", "expert"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_multihost_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh for a MULTI-PROCESS runtime, with the axis
    placement SURVEY.md §2.3 item 7 mandates:

    - ``data`` spans PROCESSES (hosts) — its collectives (eval-result
      all-gathers, gradient reductions at scene-batch granularity) ride
      DCN, which tolerates the lower bandwidth;
    - ``model`` (TP) stays WITHIN each process's local devices — its
      per-layer all-reduces need ICI bandwidth and must never cross a
      host boundary.

    Requires `utils.jax_setup.init_distributed()` to have run (or a
    single process, where it degenerates to make_mesh).  ``model`` must
    divide the local device count; ``data`` = total/model with all of a
    process's devices in the same model group.
    """
    devs = jax.devices()
    n_local = len(jax.local_devices())
    assert model <= n_local and n_local % model == 0, \
        f"model axis ({model}) must fit within one host ({n_local} local)"
    # order devices so process id is the slowest-varying dimension: rows
    # of the (data, model) grid then never straddle a process boundary
    devs = sorted(devs, key=lambda d: (d.process_index, d.id))
    data = len(devs) // model
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _dec_layer_specs(layer: Dict, has_expert_axis: bool) -> Dict[str, P]:
    """Tensor-parallel partition specs for one decoder layer: attention
    heads and MLP hidden shard over ``model``; residual-dim axes stay
    replicated so layernorms need no collectives.  MoE layers shard the
    expert dimension over the ``expert`` axis when the mesh has one
    (expert parallelism), else over ``model``."""
    specs = {
        "ln1": P(), "ln2": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
    }
    if "router" in layer:
        e_axis = "expert" if has_expert_axis else "model"
        specs["router"] = P()
        specs["we_gate"] = P(e_axis, None, None)
        specs["we_up"] = P(e_axis, None, None)
        specs["we_down"] = P(e_axis, None, None)
    else:
        specs["w_gate"] = P(None, "model")
        specs["w_up"] = P(None, "model")
        specs["w_down"] = P("model", None)
    return specs


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
    has_expert = False
    # callers may pass a mesh later; detect via thread-local not needed —
    # spec choice keys off the axis set at shard time (see make_vlm_shardings)
    return {
        "dec": {
            "embed": P(),          # replicated (tied LM head)
            "ln_f": P(),
            "img_proj": P(),
            "layers": [_dec_layer_specs(l, has_expert) for l in dec["layers"]],
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
    if "expert" in mesh.axis_names:
        e = "expert"
        for lspec, layer in zip(specs["dec"]["layers"],
                                params["dec"]["layers"]):
            if "router" in layer:
                lspec["we_gate"] = P(e, None, None)
                lspec["we_up"] = P(e, None, None)
                lspec["we_down"] = P(e, None, None)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place a parameter pytree onto the mesh with TP shardings."""
    sh = make_vlm_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def make_seq_mesh(seq: int, data: int = 1,
                  devices: Optional[list] = None) -> Mesh:
    """(data, seq) mesh for sequence-parallel prefill (ring attention in
    serving, `msc_tpu/models/decoder.py::prefill_contig`)."""
    devices = devices if devices is not None else jax.devices()
    assert data * seq == len(devices), \
        f"mesh {data}x{seq} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading sharding for inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
