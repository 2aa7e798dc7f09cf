"""Pallas flash attention for VLM prefill.

The multimodal prompts are long (6 camera views x 256 image tokens + long
observation texts -> 2k+ positions), so prefill attention dominates the
serving path's HBM traffic: materializing per-head (T, T) score matrices
moves O(B*H*T^2) floats through HBM.  This kernel streams KV blocks
through VMEM with an online softmax (flash attention), so HBM traffic is
O(B*T*(H+KV)*hd) — the inputs/outputs only.

Supports GQA (KV heads < Q heads), causal masking, and right-/left-padded
batches via a per-position validity mask.  Forward-only (serving); the
training path keeps the XLA einsum formulation (fast enough there, and
autodiff comes free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                  block_k: int, sm_scale: float):
    qi = pl.program_id(1)          # query-block index
    t_kv = k_ref.shape[1]
    n_kv_blocks = t_kv // block_k

    q = q_ref[0].astype(jnp.float32) * sm_scale        # (block_q, hd)
    q_pos = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (bq, bk)
        kv_pos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        vmask = valid_ref[0, 0, pl.ds(j * block_k, block_k)][None, :] > 0
        mask = (kv_pos <= q_pos) & vmask
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    hd = q_ref.shape[2]
    acc0 = jnp.zeros((block_q, hd), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    # only KV blocks up to (and including) the diagonal contribute
    n_steps = jnp.minimum((qi + 1) * block_q // block_k, n_kv_blocks)
    acc, m, l = jax.lax.fori_loop(0, n_steps, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            valid: jax.Array, block_q: int = 128,
                            block_k: int = 128,
                            interpret: bool = False) -> jax.Array:
    """Causal GQA flash attention.

    Args:
        q: (B, T, H, hd); k/v: (B, T, KV, hd); valid: (B, T) bool
           (attendable key positions, e.g. non-pad).
    Returns (B, T, H, hd), same dtype as q.  T must divide by the blocks.
    """
    B, T, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    sm_scale = hd ** -0.5

    qt = q.transpose(0, 2, 1, 3).reshape(B * H, T, hd)
    kt = k.transpose(0, 2, 1, 3).reshape(B * KV, T, hd)
    vt = v.transpose(0, 2, 1, 3).reshape(B * KV, T, hd)
    valid_i = valid.astype(jnp.int32).reshape(B, 1, T)

    grid = (B * H, T // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, block_k=block_k,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda bh, qi: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda bh, qi: (bh // G, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, hd), lambda bh, qi: (bh // G, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, hd), q.dtype),
        interpret=interpret,
    )(valid_i, qt, kt, vt)

    return out.reshape(B, H, T, hd).transpose(0, 2, 1, 3)
