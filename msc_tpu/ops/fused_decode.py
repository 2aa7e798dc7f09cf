"""Fused decode-step Pallas kernel: the whole decoder stack in ONE kernel.

Why: a single autoregressive decode step on the contiguous serving path
is ~80 small XLA ops (7 projections + norms + rope + attention per layer
x L layers), each a few microseconds of fixed cost on a (B, 1, D)
activation — measured ~260 us/step on v5e for msc-vlm-s where the pure
HBM floor (read every decoder weight once) is ~55 us.  This kernel runs
the entire layer stack as one `pallas_call` with grid=(L,):

- per-layer weights are stacked on a leading L axis and streamed
  HBM->VMEM by the grid BlockSpec (Pallas double-buffers them, so layer
  l+1's weights load while layer l computes — the bandwidth-optimal
  schedule for a weight-bound step);
- the (B, 1, D) activation lives in a VMEM accumulator whose block is
  constant across the (sequential) grid steps — the layer loop carry;
- the KV cache stays in HBM; each layer DMAs its (B, Tmax) K/V span
  into VMEM scratch, computes masked GQA attention in f32, and emits
  the new (k, v) row per layer — the caller scatters them into the
  cache with ONE dynamic-update-slice for all layers (vs 2L scattered
  updates before).

Mosaic constraints that shaped the code: no cross-lane reshapes (hence
the lane-wise RoPE via `pltpu.roll` and the unit middle dimension
carried end-to-end instead of (B, H, hd) head reshapes), matmuls need
non-empty non-contracting dims on both operands (hence (B, 1, hd) x
(B, Tmax, hd) batched dots), and iota must be integer-typed.

The kernel covers the dense (non-MoE) families on a single chip; the TP
mesh path keeps the unpacked XLA step (parallel/mesh.py shards those
names).  Token-identical to `decoder.decode_step_contig` at f32 and
within one rounding step at bf16 (tested on the CPU interpreter and
on-device via tools/decode_bench.py).

Reference cost anchor: the reference decodes on Azure; this subsystem is
greenfield (SURVEY.md section 2.2 row 8, BASELINE.json north star).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stack_decoder_layers(dparams: Dict) -> Dict:
    """Stack per-layer dense weights on a leading L axis for the fused
    kernel.  Returns {} for MoE layers (kernel covers dense only)."""
    layers = dparams["layers"]
    if any("router" in l for l in layers):
        return {}
    cat = lambda name: jnp.stack([l[name] for l in layers])
    wqkv = jnp.stack([
        jnp.concatenate([l["wq"], l["wk"], l["wv"]], axis=1)
        for l in layers])                       # (L, D, (H+2KV)*hd)
    w_gu = jnp.stack([
        jnp.concatenate([l["w_gate"], l["w_up"]], axis=1)
        for l in layers])                       # (L, D, 2M)
    return {
        "ln1": cat("ln1"), "ln2": cat("ln2"),   # (L, D)
        "wqkv": wqkv, "wo": cat("wo"),          # (L, H*hd, D)
        "w_gu": w_gu, "w_down": cat("w_down"),  # (L, M, D)
    }


def _rmsnorm_f32(x, scale):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6)
    return y * scale.astype(jnp.float32)


def _rope_row(x, pos, theta, hd):
    """x: (B, 1, n_heads*hd) -> rope at scalar position pos.

    Lane-wise formulation (no cross-lane reshape, which Mosaic rejects):
    out = x*cos + partner(x)*sgn*sin, where partner exchanges the two
    halves of each head via two whole-row rolls + a select, sgn is -1 on
    first-half lanes, and the per-lane frequency is theta^(-(c mod
    half)/half) (both halves of a head share frequencies since hd =
    2*half)."""
    W = x.shape[-1]
    half = hd // 2
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    freqs = theta ** (-(col % half).astype(jnp.float32) / half)
    ang = pos.astype(jnp.float32) * freqs
    cosv, sinv = jnp.cos(ang), jnp.sin(ang)
    first = (col % hd) < half                    # (1, 1, W)
    x32 = x.astype(jnp.float32)
    partner = jnp.where(first, pltpu.roll(x32, W - half, 2),
                        pltpu.roll(x32, half, 2))
    sgn = jnp.where(first, -1.0, 1.0)
    return x32 * cosv + partner * sgn * sinv


def _fused_kernel(pos_ref,                       # scalar prefetch (1,) SMEM
                  x_ref, ln1_ref, wqkv_ref, wo_ref, ln2_ref, w_gu_ref,
                  w_down_ref, k_hbm, v_hbm, valid_ref,
                  x_out_ref, k_new_ref, v_new_ref,
                  k_vmem, v_vmem, sems,
                  *, cfg_tuple):
    (H, KV, hd, M, Tmax, theta) = cfg_tuple
    G = H // KV
    B = x_ref.shape[0]
    pos = pos_ref[0]
    li = pl.program_id(0)

    # ---- start this layer's K/V span streaming HBM -> VMEM
    k_dma = pltpu.make_async_copy(k_hbm.at[li], k_vmem, sems.at[0])
    v_dma = pltpu.make_async_copy(v_hbm.at[li], v_vmem, sems.at[1])
    k_dma.start()
    v_dma.start()

    # ---- residual stream carry: x_out_ref is a VMEM accumulator whose
    # block is constant across the (sequential) grid steps — layer 0
    # seeds it from the input, later layers read the previous layer's
    # output from it
    @pl.when(li == 0)
    def _():
        x_out_ref[:] = x_ref[:]

    x = x_out_ref[:]                              # (B, 1, D)
    h = _rmsnorm_f32(x, ln1_ref[0]).astype(x.dtype)
    qkv = jnp.dot(h, wqkv_ref[0], preferred_element_type=jnp.float32)
    q = qkv[:, :, : H * hd]
    k_new = qkv[:, :, H * hd: (H + KV) * hd]
    v_new = qkv[:, :, (H + KV) * hd:]             # (B, 1, KV*hd) f32

    q = _rope_row(q, pos, theta, hd)              # f32
    k_new = _rope_row(k_new, pos, theta, hd)
    k_new_ref[0] = k_new.astype(k_new_ref.dtype)
    v_new_ref[0] = v_new.astype(v_new_ref.dtype)
    # round-trip through the cache dtype: the XLA path reads the newly
    # written (cache-dtype) row back, so the self score must match it
    k_new = k_new.astype(k_new_ref.dtype).astype(jnp.float32)
    v_new = v_new.astype(v_new_ref.dtype).astype(jnp.float32)

    # ---- masked GQA attention over the cached prefix + self
    q = q * hd ** -0.5                            # (B, 1, H*hd) f32

    k_dma.wait()
    v_dma.wait()
    ks = k_vmem[:].astype(x.dtype)                # (B, Tmax, KV*hd)
    vs = v_vmem[:].astype(x.dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tmax), 2)
    live = (idx < pos) & (valid_ref[:] != 0)      # (B, 1, Tmax)

    # static loop over heads — every operand stays rank 3 with lane
    # slices only; the unit middle dim gives Mosaic's matmul the
    # non-contracting dims it requires.  Cast structure mirrors
    # decoder.decode_step_contig (f32 scores and softmax, compute-dtype
    # probability x V matmul) so the fused path tracks the XLA path
    # bit-for-bit at f32 and within one rounding step at bf16.
    o_parts = []
    for head in range(H):
        kv = head // G
        q_h = q[:, :, head * hd: (head + 1) * hd]     # (B, 1, hd) f32
        k_kv = ks[:, :, kv * hd: (kv + 1) * hd]       # (B, Tmax, hd)
        v_kv = vs[:, :, kv * hd: (kv + 1) * hd]
        k_new_h = k_new[:, :, kv * hd: (kv + 1) * hd]
        v_new_h = v_new[:, :, kv * hd: (kv + 1) * hd]
        # self score (always attendable): (B, 1, 1)
        s_sf = jnp.sum(q_h * k_new_h, axis=-1, keepdims=True)
        # cached scores: (B, 1, hd) x (B, Tmax, hd) -> (B, 1, Tmax)
        s = jax.lax.dot_general(
            q_h.astype(x.dtype), k_kv,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = jnp.where(live, s, -1e30)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_sf)
        p = jnp.exp(s - m)
        p_sf = jnp.exp(s_sf - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_sf   # (B, 1, 1)
        p = (p / denom).astype(x.dtype)
        o_h = jax.lax.dot_general(
            p, v_kv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (B, 1, hd)
        o_h = o_h + (p_sf / denom) * v_new_h
        o_parts.append(o_h)
    o = jnp.concatenate(o_parts, axis=2).astype(x.dtype)    # (B, 1, H*hd)

    x = x + jnp.dot(o, wo_ref[0],
                    preferred_element_type=jnp.float32).astype(x.dtype)

    # ---- SwiGLU MLP
    h2 = _rmsnorm_f32(x, ln2_ref[0]).astype(x.dtype)
    gu = jnp.dot(h2, w_gu_ref[0], preferred_element_type=jnp.float32)
    g, u = gu[:, :, :M], gu[:, :, M:]
    ff = (jax.nn.silu(g) * u).astype(x.dtype)
    x = x + jnp.dot(ff, w_down_ref[0],
                    preferred_element_type=jnp.float32).astype(x.dtype)
    x_out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("cfg_tuple", "interpret"))
def fused_decode_layers(x, fused: Dict, k_cache, v_cache, valid, pos,
                        cfg_tuple: Tuple, interpret: bool = False):
    """Run all decoder layers for one decode step.

    x: (B, D) activation after embedding.
    fused: stacked weights from `stack_decoder_layers`.
    k_cache/v_cache: (L, B, Tmax, KV, hd) contiguous cache (read-only
    here; caller scatters the returned new rows at `pos`).
    valid: (B, Tmax) bool attendable-position mask (EXCLUDING pos).
    pos: scalar int32 current write position.

    Returns (x_out (B, D), k_new (L, B, KV*hd), v_new (L, B, KV*hd)).
    """
    (H, KV, hd, M, Tmax, theta) = cfg_tuple
    L, B = k_cache.shape[0], x.shape[0]
    D = x.shape[1]
    kvd = KV * hd
    kc = k_cache.reshape(L, B, Tmax, kvd)
    vc = v_cache.reshape(L, B, Tmax, kvd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((B, 1, D), lambda l, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # x
            pl.BlockSpec((1, 1, D), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # ln1
            pl.BlockSpec((1, D, (H + 2 * KV) * hd), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # wqkv
            pl.BlockSpec((1, H * hd, D), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # wo
            pl.BlockSpec((1, 1, D), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # ln2
            pl.BlockSpec((1, D, 2 * M), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # w_gu
            pl.BlockSpec((1, M, D), lambda l, p: (l, 0, 0),
                         memory_space=pltpu.VMEM),           # w_down
            pl.BlockSpec(memory_space=pl.ANY),               # k_cache (HBM)
            pl.BlockSpec(memory_space=pl.ANY),               # v_cache (HBM)
            pl.BlockSpec((B, 1, Tmax), lambda l, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # valid
        ],
        out_specs=[
            pl.BlockSpec((B, 1, D), lambda l, p: (0, 0, 0),
                         memory_space=pltpu.VMEM),           # x_out
            pl.BlockSpec((1, B, 1, kvd), lambda l, p: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # k_new
            pl.BlockSpec((1, B, 1, kvd), lambda l, p: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Tmax, kvd), k_cache.dtype),       # k span
            pltpu.VMEM((B, Tmax, kvd), v_cache.dtype),       # v span
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fused_kernel, cfg_tuple=cfg_tuple)
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, D), x.dtype),
            jax.ShapeDtypeStruct((L, B, 1, kvd), k_cache.dtype),
            jax.ShapeDtypeStruct((L, B, 1, kvd), v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1),
      x[:, None, :], fused["ln1"][:, None, :], fused["wqkv"], fused["wo"],
      fused["ln2"][:, None, :], fused["w_gu"], fused["w_down"], kc, vc,
      valid[:, None, :].astype(jnp.int8))
    return (x_out[:, 0, :], k_new.reshape(L, B, kvd),
            v_new.reshape(L, B, kvd))
