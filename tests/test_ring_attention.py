"""Ring attention (sequence parallel) vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msc_tpu.models.decoder import _attention_full
from msc_tpu.parallel.mesh import make_mesh
from msc_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _reference(q, k, v, valid):
    T = q.shape[1]
    mask = jnp.tril(jnp.ones((T, T), bool))[None] & valid[:, None, :]
    out = _attention_full(q, k, v, mask, jnp.float32)
    return np.asarray(out).reshape(q.shape)


@pytest.mark.parametrize("seq_devices", [4, 8])
def test_ring_matches_reference(seq_devices):
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:seq_devices])
    mesh = Mesh(devices.reshape(seq_devices), ("seq",))

    B, T, H, KV, hd = 2, 256, 4, 2, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KV, hd)), jnp.float32)
    valid = np.ones((B, T), bool)
    valid[0, :19] = False  # left padding
    valid_j = jnp.asarray(valid)

    got = np.asarray(ring_attention(q, k, v, valid_j, mesh, axis="seq"))
    want = _reference(q, k, v, valid_j)
    rows = valid
    np.testing.assert_allclose(got[rows], want[rows], rtol=2e-4, atol=2e-4)


def test_seq_parallel_forward_matches():
    """Teacher-forced forward with ring attention (seq-sharded) must match
    the single-device forward."""
    from jax.sharding import Mesh

    from msc_tpu.config import VLMConfig
    from msc_tpu.models.tokenizer import PAD_ID
    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.training.train import forward_logits

    cfg = VLMConfig(
        image_size=28, patch_size=14, vit_width=64, vit_depth=2, vit_heads=4,
        d_model=128, n_layers=2, n_heads=8, n_kv_heads=2, head_dim=16,
        mlp_hidden=256, max_seq_len=256, page_size=16, dtype="float32")
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(32, 120, size=(2, 128)), np.int32)
    ids[:, -9:] = PAD_ID
    ids_j = jnp.asarray(ids)

    base = np.asarray(forward_logits(params, cfg, ids_j, None))
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("seq",))
    sp = np.asarray(forward_logits(params, cfg, ids_j, None, seq_mesh=mesh))
    valid = ids != PAD_ID
    np.testing.assert_allclose(sp[valid], base[valid], rtol=2e-3, atol=2e-3)
