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
