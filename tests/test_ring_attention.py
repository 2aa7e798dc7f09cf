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
