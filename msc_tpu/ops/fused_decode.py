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
                  k_vmem, v_vmem, qs_scr, sems,
                  *, cfg_tuple, n_chunks):
    (H, KV, hd, M, Tmax, theta) = cfg_tuple
    G = H // KV
    B = x_ref.shape[0]
    pos = pos_ref[0]
    li = pl.program_id(0)

    # ---- start this layer's K/V span streaming HBM -> VMEM.  The span
    # is live-length-bounded in Tmax/n_chunks granularity: chunk c is
    # copied only when the live prefix (pos+1 rows incl. self) reaches
    # it — rows past the live prefix are masked out below, so their
    # stale scratch content never contributes.  Each chunk gets its own
    # semaphore; start/wait pair under identical predicates.
    ch = Tmax // n_chunks

    def _span_dmas(c):
        lo = c * ch
        return (pltpu.make_async_copy(k_hbm.at[li, :, lo:lo + ch],
                                      k_vmem.at[:, lo:lo + ch],
                                      sems.at[0, c]),
                pltpu.make_async_copy(v_hbm.at[li, :, lo:lo + ch],
                                      v_vmem.at[:, lo:lo + ch],
                                      sems.at[1, c]))

    for c in range(n_chunks):
        @pl.when((c == 0) | (pos >= c * ch))
        def _(c=c):
            kd, vd = _span_dmas(c)
            kd.start()
            vd.start()

        if c > 0:
            # skipped chunks: zero V so the (probability x V) matmul sees
            # finite values where p==0 (K garbage is masked via the score
            # `live` select, but 0 x NaN would still poison the output)
            @pl.when(pos < c * ch)
            def _(c=c):
                v_vmem[:, c * ch:(c + 1) * ch, :] = jnp.zeros(
                    (B, ch, v_vmem.shape[-1]), v_vmem.dtype)

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

    q = q * hd ** -0.5                            # (B, 1, H*hd) f32
    # scatter q lanes onto sublanes: (B, 1, H*hd) -> (B, H, hd), so each
    # GQA group's scores/output are ONE (Tmax x hd)x(hd x G) / (G x Tmax)
    # x(Tmax x hd) MXU matmul instead of H tiny per-head matvecs (the
    # measured loss of the round-2 kernel: 16 matvecs/layer of shape
    # (1 x hd)x(hd x Tmax) left the MXU idle)
    for head in range(H):
        qs_scr[:, head:head + 1, :] = q[:, :, head * hd: (head + 1) * hd]

    for c in range(n_chunks):
        @pl.when((c == 0) | (pos >= c * ch))
        def _(c=c):
            kd, vd = _span_dmas(c)
            kd.wait()
            vd.wait()

    # the self row joins the cached span in scratch (round-tripped
    # through the cache dtype exactly as the XLA path reads it back), so
    # attention needs no separate self-score path
    k_vmem[:, pl.ds(pos, 1), :] = k_new.astype(k_vmem.dtype)
    v_vmem[:, pl.ds(pos, 1), :] = v_new.astype(v_vmem.dtype)

    ks = k_vmem[:].astype(x.dtype)                # (B, Tmax, KV*hd)
    vs = v_vmem[:].astype(x.dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, Tmax, 1), 1)
    live = (((idx < pos) & (valid_ref[:] != 0))
            | (idx == pos))                       # (B, Tmax, 1)

    # ---- masked GQA attention, one matmul pair per KV group.  Cast
    # structure mirrors decoder.decode_step_contig (bf16 score matmul
    # with f32 accumulation, f32 softmax, compute-dtype probability x V
    # matmul) so the fused path tracks the XLA path bit-for-bit at f32
    # and within one rounding step at bf16.
    qs = qs_scr[:].astype(x.dtype)                # (B, H, hd)
    o_parts = []
    for kv in range(KV):
        k_g = ks[:, :, kv * hd: (kv + 1) * hd]        # (B, Tmax, hd)
        v_g = vs[:, :, kv * hd: (kv + 1) * hd]
        q_g = qs[:, kv * G: (kv + 1) * G, :]          # (B, G, hd)
        s = jax.lax.dot_general(
            k_g, q_g, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (B, Tmax, G)
        s = jnp.where(live, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)         # (B, 1, G)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        p = (p / denom).astype(x.dtype)
        o_g = jax.lax.dot_general(
            p, v_g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (B, G, hd)
        for g in range(G):
            o_parts.append(o_g[:, g:g + 1, :])        # (B, 1, hd)
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
    # live-length-bounded K/V streaming: 4 chunks when the span tiles
    # cleanly on sublanes, else one full-span copy
    n_chunks = 4 if Tmax % 4 == 0 and (Tmax // 4) % 8 == 0 else 1

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
            pl.BlockSpec((B, Tmax, 1), lambda l, p: (0, 0, 0),
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
            pltpu.VMEM((B, H, hd), jnp.float32),             # q head-major
            pltpu.SemaphoreType.DMA((2, n_chunks)),
        ],
    )
    kernel = functools.partial(_fused_kernel, cfg_tuple=cfg_tuple,
                               n_chunks=n_chunks)
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
      valid[:, :, None].astype(jnp.int8))
    return (x_out[:, 0, :], k_new.reshape(L, B, kvd),
            v_new.reshape(L, B, kvd))
