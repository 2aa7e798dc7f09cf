"""Pallas paged-attention decode kernel with fused in-place page writes.

Round-1's paged KV layout was correct but scatter-copy bound: the
functional ``pool.at[li, pages, offset].set(...)`` update copies the whole
physical pool every step (measured ~5.5 ms/step at a 400 MB pool vs <1 ms
for the contiguous layout — `msc_tpu/models/decoder.py` ContigCache docs).
This kernel makes the paged layout the production path (round-1 VERDICT
item 4):

  * the new token's K/V rows are DMA'd into their page IN PLACE
    (``input_output_aliases`` — no pool copy ever happens);
  * attention then streams each sequence's pages HBM -> VMEM with an
    online softmax (flash-decode) and double-buffered DMA, so per-step
    HBM traffic is O(live tokens), not O(pool);
  * the block table is a scalar-prefetch operand, so page addresses are
    known before the kernel body runs and the page DMAs pipeline.

GQA-as-one-matmul trick (Mosaic alignment): pages store keys/values with
the (KV, hd) dims MERGED into one lane dimension of width KV*hd (a
multiple of 128 for every model family), and the query arrives
ZERO-EXPANDED — q_exp[h] is zero everywhere except its own KV head's hd
segment — so ``q_exp @ k_page.T`` contracts to exactly q[h].k[t, kv(h)]
with no per-head lane slicing inside the kernel (Mosaic requires lane
slices to be 128-aligned).  The matching per-head segment extraction of
the PV product happens outside the kernel in XLA.  Extra FLOPs: KV x on
the two tiny per-page matmuls — noise next to the DMA traffic that
dominates decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_decode_kernel(bt_ref, len_ref,            # scalar prefetch (SMEM)
                         q_ref, newk_ref, newv_ref,  # VMEM per-row inputs
                         kp_hbm, vp_hbm,             # HBM page pools (inputs)
                         o_ref,                      # VMEM per-row output
                         kp_out, vp_out,             # aliased pool outputs
                         k_scratch, v_scratch, sems,
                         *, page: int, n_heads: int, kvd: int,
                         sm_scale: float):
    b = pl.program_id(0)
    pos = len_ref[b]                     # tokens already cached; write here
    page_cursor = pos // page
    offset = pos % page
    write_page = bt_ref[b, page_cursor]

    q = q_ref[0].astype(jnp.float32) * sm_scale       # (H, kvd) zero-expanded

    n_pages = page_cursor + 1  # pages holding tokens 0..pos

    def get_dma(slot, j):
        return (
            pltpu.make_async_copy(kp_out.at[bt_ref[b, j]],
                                  k_scratch.at[slot], sems.at[2 + slot]),
            pltpu.make_async_copy(vp_out.at[bt_ref[b, j]],
                                  v_scratch.at[slot], sems.at[4 + slot]),
        )

    dk, dv = get_dma(0, 0)
    dk.start()
    dv.start()

    def body(j, carry):
        acc, m_prev, l_prev = carry
        slot = j % 2

        @pl.when(j + 1 < n_pages)
        def _():
            nk, nv = get_dma((j + 1) % 2, j + 1)
            nk.start()
            nv.start()

        ck, cv = get_dma(slot, j)
        ck.wait()
        cv.wait()

        # ---- fused in-place page write, on the LAST page only: DMA
        # slicing a single row is forbidden by tiling, but a dynamic
        # VECTOR store into the VMEM copy is legal — write the new
        # token's K/V row there, then DMA the WHOLE page back to the
        # (aliased) pool.  Attention below reads the updated scratch.
        @pl.when(j == page_cursor)
        def _():
            # masked full-page merge (dynamic single-row vector stores
            # are tiling-restricted; a where over the page is free)
            row = jax.lax.broadcasted_iota(jnp.int32, (page, kvd), 0)
            k_scratch[slot] = jnp.where(
                row == offset,
                jnp.broadcast_to(newk_ref[0], (page, kvd)),
                k_scratch[slot])
            v_scratch[slot] = jnp.where(
                row == offset,
                jnp.broadcast_to(newv_ref[0], (page, kvd)),
                v_scratch[slot])
            wb_k = pltpu.make_async_copy(
                k_scratch.at[slot], kp_out.at[bt_ref[b, j]], sems.at[0])
            wb_v = pltpu.make_async_copy(
                v_scratch.at[slot], vp_out.at[bt_ref[b, j]], sems.at[1])
            wb_k.start()
            wb_v.start()
            wb_k.wait()
            wb_v.wait()

        k = k_scratch[slot].astype(jnp.float32)   # (page, kvd)
        v = v_scratch[slot].astype(jnp.float32)

        # zero-expanded q makes this contract to per-head GQA scores
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, page)
        valid = (j * page + jax.lax.broadcasted_iota(
            jnp.int32, (n_heads, page), 1)) <= pos
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (H, kvd)
        return acc * alpha + pv, m_cur, l_cur

    acc0 = jnp.zeros((n_heads, kvd), jnp.float32)
    m0 = jnp.full((n_heads, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((n_heads, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_pages, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(q: jax.Array, new_k: jax.Array, new_v: jax.Array,
                           k_pages: jax.Array, v_pages: jax.Array,
                           block_tables: jax.Array, lengths: jax.Array,
                           interpret: bool = False):
    """One decode step of paged GQA attention, writing K/V in place.

    Args:
        q: (B, H, hd) query for the token being decoded (pre-RoPE'd).
        new_k/new_v: (B, KV, hd) this token's K/V (pre-RoPE'd).
        k_pages/v_pages: (P, page, KV*hd) one layer's physical pools —
            note the MERGED lane dim (see module docstring).  Aliased
            with the outputs (the generate loop's cache donation makes
            this safe).
        block_tables: (B, max_pages) int32 physical page ids (>= 0).
        lengths: (B,) int32 tokens already cached per row (write position).

    Returns (o (B, H, hd), k_pages', v_pages') — pools updated in place.
    """
    B, H, hd = q.shape
    KV = new_k.shape[1]
    G = H // KV
    P, page, kvd = k_pages.shape
    assert kvd == KV * hd
    sm_scale = hd ** -0.5

    # zero-expand the query: head h occupies its own KV head's hd segment
    head_kv = jnp.arange(H) // G                          # (H,)
    q_exp = jnp.zeros((B, H, KV, hd), q.dtype)
    q_exp = q_exp.at[:, jnp.arange(H), head_kv].set(q)
    q_exp = q_exp.reshape(B, H, kvd)

    kernel = functools.partial(
        _paged_decode_kernel, page=page, n_heads=H, kvd=kvd,
        sm_scale=sm_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            # per-row blocks keep the last two dims equal to the full
            # array dims (Mosaic tiling rule); kvd is 128-aligned
            pl.BlockSpec((1, H, kvd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # q_exp (B, H, kvd)
            pl.BlockSpec((1, 1, kvd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # new_k (B, 1, kvd)
            pl.BlockSpec((1, 1, kvd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # new_v (B, 1, kvd)
            # pools PINNED to HBM: untiled, so single-row DMA slices at
            # dynamic (page, offset) are legal (ANY may pick VMEM for
            # small pools, whose tiling forbids those slices)
            pl.BlockSpec(memory_space=pltpu.HBM),    # k_pages
            pl.BlockSpec(memory_space=pltpu.HBM),    # v_pages
        ],
        out_specs=(
            pl.BlockSpec((1, H, kvd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # o_full (B, H, kvd)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, page, kvd), k_pages.dtype),
            pltpu.VMEM((2, page, kvd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    o_full, kp, vp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, kvd), q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ),
        # input indices count scalar-prefetch args first: 0=bt, 1=len,
        # 2=q_exp, 3=new_k, 4=new_v, 5=k_pages, 6=v_pages
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_tables, lengths, q_exp,
      new_k.reshape(B, 1, kvd).astype(k_pages.dtype),
      new_v.reshape(B, 1, kvd).astype(v_pages.dtype),
      k_pages, v_pages)

    # extract each head's own segment of the PV product (XLA side)
    o = o_full.reshape(B, H, KV, hd)[:, jnp.arange(H), head_kv, :]
    return o, kp, vp
