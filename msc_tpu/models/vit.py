"""SigLIP-style ViT image encoder in pure JAX.

The vision half of the on-TPU VLM (BASELINE.json north star: "batched ViT
encoding").  Design notes for TPU:

- patchify is a reshape + one (N, p*p*3) @ (p*p*3, D) matmul -> MXU;
  no conv needed.
- all heavy math in bfloat16 with float32 accumulation
  (preferred_element_type) and float32 layernorm statistics.
- the 6 camera views of a scene batch through one forward
  (reference sends them as one multi-image HTTPS prompt,
  `src/agents/content_transform/camera_agent.py:55-67`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from msc_tpu.config import VLMConfig


def _split(key, n):
    return jax.random.split(key, n)


def init_vit_params(key, cfg: VLMConfig) -> Dict:
    w = cfg.vit_width
    p = cfg.patch_size
    n_patches = (cfg.image_size // p) ** 2
    mlp = int(w * cfg.vit_mlp_ratio)
    keys = _split(key, 4 + cfg.vit_depth)
    params = {
        "patch_proj": jax.random.normal(keys[0], (p * p * 3, w)) * (p * p * 3) ** -0.5,
        "patch_bias": jnp.zeros((w,)),
        "pos_embed": jax.random.normal(keys[1], (n_patches, w)) * 0.02,
        "ln_f": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
        "blocks": [],
    }
    for i in range(cfg.vit_depth):
        bk = _split(keys[4 + i], 6)
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "ln2": {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "wqkv": jax.random.normal(bk[0], (w, 3 * w)) * w ** -0.5,
            "bqkv": jnp.zeros((3 * w,)),
            "wo": jax.random.normal(bk[1], (w, w)) * w ** -0.5,
            "bo": jnp.zeros((w,)),
            "w1": jax.random.normal(bk[2], (w, mlp)) * w ** -0.5,
            "b1": jnp.zeros((mlp,)),
            "w2": jax.random.normal(bk[3], (mlp, w)) * mlp ** -0.5,
            "b2": jnp.zeros((w,)),
        })
    return params


def _layernorm(x, p):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def vit_encode(params: Dict, images: jax.Array, cfg: VLMConfig) -> jax.Array:
    """(B, S, S, 3) float32 in [-1,1] -> (B, N_patches, vit_width)."""
    B = images.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    w = cfg.vit_width
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    x = images.reshape(B, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, g * g, p * p * 3).astype(dtype)
    x = jnp.dot(x, params["patch_proj"].astype(dtype),
                preferred_element_type=jnp.float32)
    x = (x + params["patch_bias"]).astype(dtype)
    x = x + params["pos_embed"].astype(dtype)

    H = cfg.vit_heads
    hd = w // H
    for blk in params["blocks"]:
        h = _layernorm(x, blk["ln1"])
        qkv = jnp.dot(h, blk["wqkv"].astype(dtype),
                      preferred_element_type=jnp.float32) + blk["bqkv"]
        q, k, v = jnp.split(qkv.astype(dtype), 3, axis=-1)
        q = q.reshape(B, -1, H, hd)
        k = k.reshape(B, -1, H, hd)
        v = v.reshape(B, -1, H, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * hd ** -0.5
        att = jax.nn.softmax(att, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                       preferred_element_type=jnp.float32).astype(dtype)
        o = o.reshape(B, -1, w)
        o = jnp.dot(o, blk["wo"].astype(dtype),
                    preferred_element_type=jnp.float32) + blk["bo"]
        x = x + o.astype(dtype)

        h = _layernorm(x, blk["ln2"])
        h = jnp.dot(h, blk["w1"].astype(dtype),
                    preferred_element_type=jnp.float32) + blk["b1"]
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
        h = jnp.dot(h, blk["w2"].astype(dtype),
                    preferred_element_type=jnp.float32) + blk["b2"]
        x = x + h.astype(dtype)

    return _layernorm(x, params["ln_f"])
