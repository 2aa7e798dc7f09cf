"""Pallas flash attention for the block-speculative decode step.

The block-decode while-loop (models/block_decode.py) verifies a
``Wb = 1 + W`` wide token block per iteration.  The XLA formulation
materializes the fp32 score tensor ``(B, KV, G, Wb, Tmax)`` through
``where`` -> ``softmax`` -> second einsum — at serving shapes
(B=8, Wb=8, Tmax~2048) that is ~Wb x the single-token step's score
traffic, and the single-token step already sits at the HBM roofline
(weights + KV reads).  Measured end-to-end this made one block step
cost ~4x a plain step, erasing the 2.3-3.8x sequential-step win from
speculation (RESULTS.md round 5, bench A/B).

This kernel streams the KV cache through VMEM once with an online
softmax, so per-step HBM traffic returns to the single-step roofline:
cache reads + q/o, no score materialization.

Layout trick: the cache's native layout is ``(B, Tmax, KV, hd)``; a
``(..., KV, hd)`` block has a degenerate (KV=2, hd=64) trailing tile.
Instead the kernel reads the cache as ``(B, Tmax, KV*hd)`` — a free
reshape of contiguous minor dims with a perfect (block_k, 128) tile —
and each query is zero-padded into its own head's lane window, so one
``(WbG, KV*hd) @ (KV*hd, block_k)`` matmul contracts only the matching
head's lanes (the zero lanes contribute nothing).  The ``p @ v`` output
keeps all KV*hd lanes; the caller slices each head group's window.

No reference counterpart (the reference decodes inside Azure,
``/root/reference/src/agents/base_agent.py``); this is TPU-native
serving work toward BASELINE.json's >= 2 scenes/sec/chip target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLOCK_K = 128  # every engine t_max (prompt+decode buckets) divides by 128


def _block_kernel(wp_ref, valid_ref, q_ref, k_ref, v_ref, o_ref, *,
                  block_k: int, G: int, sm_scale: float):
    """One batch row: flash attention for all KV groups of a Wb-wide block.

    wp_ref:    (1, 1) int32 SMEM — cache slot of block position 0.
    valid_ref: (1, 1, Tmax) int32 — attendable slots (prompt + committed
               + this block's proposed entries).
    q_ref:     (1, KV, WbG, D) — query rows (Wb*G per KV group), each
               zero-padded into its head's ``[kv*hd, (kv+1)*hd)`` lanes.
    k_ref/v_ref: (1, Tmax, D) — the cache layer, KV*hd lanes fused.
    o_ref:     (1, KV, WbG, D) — acc output; caller slices head windows.
    """
    wp = wp_ref[0]
    t_max = k_ref.shape[1]
    n_kv_blocks = t_max // block_k
    KV, WbG, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    # query index (block position) per score row: row = qi * G + g
    qi_row = jax.lax.broadcasted_iota(jnp.int32, (WbG, block_k), 0) // G

    for kv in range(KV):  # static unroll (KV = 2 at serving scale)
        q = q_ref[0, kv]                                    # (WbG, D)

        def body(j, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(j * block_k, block_k), :]    # (bk, D)
            v = v_ref[0, pl.ds(j * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            spos = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (WbG, block_k), 1)
            off = spos - wp
            vmask = valid_ref[0, 0, pl.ds(j * block_k, block_k)][None, :] > 0
            # past slots by validity; intra-block causally (slot offset
            # <= query index) — mirrors decode_block_contig's XLA mask
            mask = vmask & ((off < 0) | (off <= qi_row))
            s = jnp.where(mask, s, NEG_INF)

            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_cur)
            alpha = jnp.exp(m_prev - m_cur)
            l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc, m_cur, l_cur

        acc0 = jnp.zeros((WbG, D), jnp.float32)
        m0 = jnp.full((WbG, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((WbG, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, n_kv_blocks, body, (acc0, m0, l0))
        # every row attends at least the prompt slots, so l > 0; the
        # guard only protects hypothetical all-masked rows from NaN
        o_ref[0, kv] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_block_attention(q: jax.Array, ks: jax.Array, vs: jax.Array,
                          valid: jax.Array, write_pos: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Block-decode GQA attention, flash-streamed.

    Args:
        q:  (B, Wb, H, hd) post-RoPE queries for the Wb-wide block.
        ks/vs: (B, Tmax, KV, hd) cache layer (block K/V already written
            at ``[write_pos, write_pos + Wb)``).
        valid: (B, Tmax) bool — attendable slots including this block's
            proposed entries (intra-block causality applied in-kernel).
        write_pos: scalar int32 cache slot of block position 0.
    Returns (B, Wb, H, hd) in q's dtype.  Tmax must divide by 128.
    """
    B, Wb, H, hd = q.shape
    Tmax, KV = ks.shape[1], ks.shape[2]
    G = H // KV
    WbG = Wb * G
    D = KV * hd

    # kv-major query rows, zero-padded into per-head lane windows
    qkv = q.reshape(B, Wb, KV, G, hd).transpose(0, 2, 1, 3, 4)
    qp = jnp.zeros((B, KV, WbG, D), q.dtype)
    for kv in range(KV):
        qp = qp.at[:, kv, :, kv * hd:(kv + 1) * hd].set(
            qkv[:, kv].reshape(B, WbG, hd))

    k2 = ks.reshape(B, Tmax, D)
    v2 = vs.reshape(B, Tmax, D)
    valid_i = valid.astype(jnp.int32).reshape(B, 1, Tmax)
    wp = jnp.reshape(jnp.asarray(write_pos, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,       # wp rides in SMEM, prefetched
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Tmax), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, WbG, D), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tmax, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tmax, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KV, WbG, D), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_block_kernel, block_k=BLOCK_K, G=G,
                          sm_scale=hd ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, WbG, D), q.dtype),
        interpret=interpret,
    )(wp, valid_i, qp, k2, v2)

    # per-group lane windows -> (B, Wb, H, hd)
    heads = [out[:, kv, :, kv * hd:(kv + 1) * hd].reshape(B, Wb, G, hd)
             for kv in range(KV)]
    o = jnp.stack(heads, axis=2)                 # (B, Wb, KV, G, hd)
    return o.reshape(B, Wb, H, hd)
