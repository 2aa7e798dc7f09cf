"""Ring attention: sequence-parallel causal attention over a mesh axis.

Long-context prefill support (SURVEY.md section 2.3 item 5 / section 5
"long-context"): when a multimodal prompt (6 views x 256 image tokens +
long observations) outgrows one chip, the sequence axis shards across the
mesh and K/V blocks rotate around the ring via ``ppermute`` while each
device accumulates its queries' attention with an online softmax — the
classic ring-attention schedule; XLA overlaps the permute with the block
computation.

Built with ``shard_map`` so it composes with the (data, model) tensor
shardings; the collectives ride ICI.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attention(q, k, v, q_pos, kv_pos, kv_valid, sm_scale):
    """One (local-q x kv-chunk) block with GQA; returns unnormalized
    accumulator pieces (acc, m, l) for online-softmax merging.

    q: (B, Tq, H, hd); k/v: (B, Tk, KV, hd); q_pos: (Tq,); kv_pos: (Tk,);
    kv_valid: (B, Tk).
    """
    B, Tq, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    qg = q.reshape(B, Tq, KV, G, hd).astype(jnp.float32) * sm_scale
    s = jnp.einsum("btkgd,bskd->bkgts", qg, k.astype(jnp.float32))
    mask = (kv_pos[None, :] <= q_pos[:, None])[None, None, None]
    mask = mask & kv_valid[:, None, None, None, :]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)                   # (B,KV,G,Tq,1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bkgts,bskd->bkgtd", p, v.astype(jnp.float32))
    return acc, m, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   valid: jax.Array, mesh: Mesh,
                   axis: str = "seq") -> jax.Array:
    """Causal GQA attention with the sequence axis sharded over ``axis``.

    Args:
        q: (B, T, H, hd); k/v: (B, T, KV, hd); valid: (B, T) bool.
        T must divide by the axis size.
    Returns (B, T, H, hd) float32.
    """
    n = mesh.shape[axis]
    B, T, H, hd = q.shape
    chunk = T // n
    sm_scale = hd ** -0.5

    spec_seq = P(None, axis)            # shard T
    qspec = P(None, axis, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(qspec, qspec, qspec, spec_seq),
        out_specs=qspec,
    )
    def _ring(q_l, k_l, v_l, valid_l):
        idx = jax.lax.axis_index(axis)
        q_pos = idx * chunk + jnp.arange(chunk)

        def step(i, carry):
            k_cur, v_cur, valid_cur, acc, m, l = carry
            src = (idx - i) % n                       # owner of current kv
            kv_pos = src * chunk + jnp.arange(chunk)
            a, bm, bl = _block_attention(q_l, k_cur, v_cur, q_pos, kv_pos,
                                         valid_cur, sm_scale)
            # online-softmax merge
            m_new = jnp.maximum(m, bm)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(bm - m_new)
            acc = acc * alpha + a * beta
            l = l * alpha + bl * beta
            # rotate kv around the ring (send to next, receive from prev)
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            valid_nxt = jax.lax.ppermute(valid_cur, axis, perm)
            return k_nxt, v_nxt, valid_nxt, acc, m_new, l

        KV = k_l.shape[2]
        G = H // KV
        acc0 = jnp.zeros((B, KV, G, chunk, hd), jnp.float32)
        m0 = jnp.full((B, KV, G, chunk, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, KV, G, chunk, 1), jnp.float32)
        # mark the accumulators as device-varying over the ring axis so the
        # loop carry types match the per-device outputs (pvary was
        # deprecated in favor of pcast; keep working on older jax)
        if hasattr(jax.lax, "pcast"):
            acc0, m0, l0 = jax.lax.pcast((acc0, m0, l0), to="varying",
                                         axis_name=axis)
        else:
            acc0, m0, l0 = jax.lax.pvary((acc0, m0, l0), axis)
        _, _, _, acc, m, l = jax.lax.fori_loop(
            0, n, step, (k_l, v_l, valid_l, acc0, m0, l0))
        out = acc / jnp.maximum(l, 1e-30)             # (B,KV,G,chunk,hd)
        return out.transpose(0, 3, 1, 2, 4).reshape(B, chunk, H, hd)

    dsh = NamedSharding(mesh, qspec)
    vsh = NamedSharding(mesh, spec_seq)
    q = jax.device_put(q, dsh)
    k = jax.device_put(k, dsh)
    v = jax.device_put(v, dsh)
    valid = jax.device_put(valid, vsh)
    return _ring(q, k, v, valid)
