"""Flash prefill attention kernel vs the XLA einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msc_tpu.models.decoder import _attention_full
from msc_tpu.ops.attention import flash_prefill_attention

INTERPRET = jax.default_backend() == "cpu"


def _make(B=2, T=256, H=4, KV=2, hd=64, pad_left=True, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, T, H, hd)).astype(np.float32)
    k = rng.normal(size=(B, T, KV, hd)).astype(np.float32)
    v = rng.normal(size=(B, T, KV, hd)).astype(np.float32)
    valid = np.ones((B, T), bool)
    if pad_left:
        valid[0, :37] = False   # left-padded row
        valid[1, :130] = False
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(valid))


def _reference(q, k, v, valid):
    T = q.shape[1]
    mask = jnp.tril(jnp.ones((T, T), bool))[None] & valid[:, None, :]
    return _attention_full(q, k, v, mask, jnp.float32)


@pytest.mark.parametrize("pad_left", [False, True])
def test_flash_matches_reference(pad_left):
    q, k, v, valid = _make(pad_left=pad_left)
    got = flash_prefill_attention(q, k, v, valid, block_q=128, block_k=128,
                                  interpret=INTERPRET)
    B, T, H, hd = q.shape
    want = _reference(q, k, v, valid).reshape(B, T, H, hd)
    got = np.asarray(got)
    want = np.asarray(want)
    rows = np.asarray(valid)   # compare only valid query rows
    np.testing.assert_allclose(got[rows], want[rows], rtol=2e-3, atol=2e-3)


def test_flash_uneven_blocks():
    q, k, v, valid = _make(T=384, pad_left=True, seed=1)
    got = flash_prefill_attention(q, k, v, valid, block_q=128, block_k=128,
                                  interpret=INTERPRET)
    want = _reference(q, k, v, valid).reshape(q.shape)
    rows = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(got)[rows], np.asarray(want)[rows],
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Pallas paged-decode attention (round 2)
# ---------------------------------------------------------------------------

def test_paged_decode_attention_matches_reference():
    """Kernel (interpret mode) vs a float64 numpy reference: attention
    output, in-place page writes, and untouched-page preservation."""
    import numpy as np
    import jax.numpy as jnp
    from msc_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.default_rng(0)
    B, H, KV, hd, page, P, maxp = 3, 8, 2, 64, 16, 32, 4
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
    nk = jnp.asarray(rng.normal(size=(B, KV, hd)), jnp.float32)
    nv = jnp.asarray(rng.normal(size=(B, KV, hd)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, page, KV * hd)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, page, KV * hd)), jnp.float32)
    bt = jnp.asarray(rng.permutation(P)[: B * maxp].reshape(B, maxp),
                     jnp.int32)
    lengths = jnp.asarray([5, 17, 30], jnp.int32)

    o, kp2, vp2 = paged_decode_attention(q, nk, nv, kp, vp, bt, lengths,
                                         interpret=True)

    kp_ref = np.array(kp, np.float64).reshape(P, page, KV, hd)
    vp_ref = np.array(vp, np.float64).reshape(P, page, KV, hd)
    for b in range(B):
        pos = int(lengths[b])
        kp_ref[int(bt[b, pos // page]), pos % page] = nk[b]
        vp_ref[int(bt[b, pos // page]), pos % page] = nv[b]
    assert np.abs(np.array(kp2).reshape(P, page, KV, hd) - kp_ref).max() == 0
    assert np.abs(np.array(vp2).reshape(P, page, KV, hd) - vp_ref).max() == 0

    for b in range(B):
        pos = int(lengths[b])
        ks = kp_ref[np.array(bt[b])].reshape(maxp * page, KV, hd)[: pos + 1]
        vs = vp_ref[np.array(bt[b])].reshape(maxp * page, KV, hd)[: pos + 1]
        for h in range(H):
            kv = h // (H // KV)
            s = (ks[:, kv, :] @ np.array(q[b, h], np.float64)) * hd ** -0.5
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ vs[:, kv, :]
            assert np.abs(np.array(o)[b, h] - ref).max() < 1e-5


def test_decode_step_xla_paged_matches_contig():
    """The XLA paged fallback and contiguous layouts stay token-identical
    (existing guarantee); the Pallas path is covered by the kernel test
    above plus the TPU-side engine equality run."""
    # covered by tests/test_serving.py::test_engine_paged_layout_matches_contiguous
    pass


def test_chunked_training_attention_matches_full():
    """Long-sequence training attention (query-chunked + per-block remat,
    msc_tpu/training/train.py) is numerically identical to the full form
    in forward AND gradient, including a non-block-multiple T (pad path)."""
    from msc_tpu.training.train import _attention_chunked

    rng = np.random.default_rng(3)
    B, T, H, KV, hd = 2, 300, 4, 2, 16   # T % block_q != 0
    q = jnp.asarray(rng.normal(size=(B, T, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, KV, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, KV, hd)).astype(np.float32))
    valid = jnp.asarray(rng.random((B, T)) > 0.1)
    mask = jnp.tril(jnp.ones((T, T), bool))[None] & valid[:, None, :]

    o_full = _attention_full(q, k, v, mask, jnp.float32)
    o_chunk = _attention_chunked(q, k, v, mask, jnp.float32, block_q=128)
    assert jnp.abs(o_full - o_chunk).max() < 1e-5

    g_full = jax.grad(lambda q: (_attention_full(q, k, v, mask, jnp.float32) ** 2).sum())(q)
    g_chunk = jax.grad(lambda q: (_attention_chunked(q, k, v, mask, jnp.float32, 128) ** 2).sum())(q)
    assert jnp.abs(g_full - g_chunk).max() < 1e-4


# ---------------------------------------------------------------------------
# Pallas flash block-decode attention (round 5)
# ---------------------------------------------------------------------------

def _block_reference(q, ks, vs, valid, write_pos):
    """The XLA einsum formulation from models/block_decode.py
    decode_block_contig — the numerics contract the kernel must match."""
    B, Wb, H, hd = q.shape
    KV, Tmax = ks.shape[2], ks.shape[1]
    G = H // KV
    slot = jnp.arange(Tmax)[None, None, :]
    qidx = jnp.arange(Wb)[None, :, None]
    in_block = slot - write_pos
    mask = valid[:, None, :] & ((in_block < 0) | (in_block <= qidx))
    qg = q.reshape(B, Wb, KV, G, hd)
    att = jnp.einsum("btkgd,bskd->bkgts", qg, ks,
                     preferred_element_type=jnp.float32) * hd ** -0.5
    att = jnp.where(mask[:, None, None], att, -1e30)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bkgts,bskd->btkgd", att.astype(q.dtype), vs,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, Wb, H, hd)


@pytest.mark.parametrize("G", [1, 4])
def test_flash_block_matches_reference(G):
    """Kernel vs the XLA block-decode attention: left-padded prompts,
    bubbles (invalid committed slots), per-row proposal lengths, and the
    intra-block causal mask all agree."""
    from msc_tpu.ops.block_attention import flash_block_attention

    rng = np.random.default_rng(7)
    B, Wb, KV, hd, Tmax = 3, 8, 2, 64, 512
    H = KV * G
    write_pos = 300
    q = jnp.asarray(rng.normal(size=(B, Wb, H, hd)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(B, Tmax, KV, hd)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(B, Tmax, KV, hd)), jnp.float32)
    valid = np.zeros((B, Tmax), bool)
    valid[0, 37:write_pos] = True      # left-padded prompt
    valid[1, :write_pos] = True
    valid[2, 5:write_pos] = True
    valid[1, 120:140] = False          # bubbles from rejected drafts
    # block proposals: per-row lengths (row 2 "done" -> none)
    valid[0, write_pos:write_pos + 8] = True
    valid[1, write_pos:write_pos + 3] = True
    valid = jnp.asarray(valid)

    got = flash_block_attention(q, ks, vs, valid, jnp.int32(write_pos),
                                interpret=INTERPRET)
    want = _block_reference(q, ks, vs, valid, jnp.int32(write_pos))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
