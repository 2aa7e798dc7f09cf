"""VLM fine-tuning: sharded next-token training step.

Greenfield subsystem (the reference's "weights" live at Azure; there is
nothing to train).  Enables adapting the on-TPU VLM to driving-scene
captioning: next-token cross-entropy on caption tokens conditioned on the
6-view images, sharded dp x tp over a ``("data", "model")`` mesh via
explicit output shardings; XLA GSPMD inserts the gradient all-reduces.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from msc_tpu.config import VLMConfig
from msc_tpu.models import vit as vit_mod
from msc_tpu.models.decoder import _mlp, _rmsnorm, _rope, _attention_full
from msc_tpu.models.decoder import embed_tokens
from msc_tpu.models.tokenizer import IMG_ID, PAD_ID

# Above this sequence length the training forward switches from full
# (T, T)-score attention to the query-chunked form below.  At T=2560 the
# full form's fp32 scores are ~840 MB/layer for msc-vlm-m (B=2, KV=4,
# G=4) and the layer-level remat re-materializes them during backward —
# the chunked form bounds live attention memory to O(block_q * T).
_CHUNK_ATTN_MIN_T = 1024


def _attention_chunked(q, k, v, mask, dtype, block_q: int = 256):
    """Memory-bounded GQA attention for long-sequence training.

    Numerically identical to ``_attention_full`` (same einsum/softmax, no
    online-softmax approximation): a ``lax.scan`` over query blocks keeps
    only one (B, KV, G, block_q, T) score tile live at a time, and
    ``jax.checkpoint`` on the block body re-derives that tile in backward
    instead of saving every block's softmax output.
    """
    B, T, H, hd = q.shape
    KV = k.shape[2]
    blk = min(block_q, T)
    pad = (-T) % blk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    Tp = q.shape[1]
    nq = Tp // blk
    G = H // KV
    qb = q.reshape(B, nq, blk, KV, G, hd).transpose(1, 0, 2, 3, 4, 5)
    mb = mask.reshape(B, nq, blk, T).transpose(1, 0, 2, 3)

    @jax.checkpoint
    def _block(qc, mc):
        att = jnp.einsum("btkgd,bskd->bkgts", qc, k,
                         preferred_element_type=jnp.float32) * hd ** -0.5
        att = jnp.where(mc[:, None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum("bkgts,bskd->btkgd", att.astype(dtype), v,
                          preferred_element_type=jnp.float32)

    def _body(_, qm):
        qc, mc = qm
        return None, _block(qc, mc)

    _, ob = jax.lax.scan(_body, None, (qb, mb))
    o = ob.transpose(1, 0, 2, 3, 4, 5).reshape(B, Tp, H * hd)
    return o[:, :T].astype(dtype)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def forward_logits(params: Dict, cfg: VLMConfig, ids: jax.Array,
                   images: Optional[jax.Array],
                   seq_mesh=None) -> jax.Array:
    """Teacher-forced logits over the whole sequence (training path; the
    serving path with its paged cache lives in msc_tpu/models/decoder.py).

    ids: (B, T); images: (B*V, S, S, 3) or None.
    seq_mesh: optional Mesh with a ``seq`` axis — attention runs as ring
    attention with the sequence sharded across devices (sequence
    parallelism for long-context training; msc_tpu/parallel/ring_attention).
    Returns (B, T, vocab) float32 logits.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, T = ids.shape
    img_embeds = None
    if images is not None:
        enc = vit_mod.vit_encode(params["vit"], images, cfg)
        enc = enc.reshape(B, -1, cfg.vit_width)
        img_embeds = enc

    x = embed_tokens(params["dec"], ids, img_embeds, IMG_ID, dtype)
    valid = ids != PAD_ID
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    mask = jnp.tril(jnp.ones((T, T), bool))[None] & valid[:, None, :]

    dec = params["dec"]

    @jax.checkpoint  # rematerialize per layer: long-seq activations (esp.
    def _layer(x, layer):  # the (B,H,T,T) scores) dominate training HBM
        h = _rmsnorm(x, layer["ln1"])
        q = jnp.dot(h, layer["wq"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        k = jnp.dot(h, layer["wk"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        v = jnp.dot(h, layer["wv"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        q = _rope(q.reshape(B, T, cfg.n_heads, cfg.head_dim), positions,
                  cfg.rope_theta)
        k = _rope(k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim), positions,
                  cfg.rope_theta)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        if seq_mesh is not None:
            from msc_tpu.parallel.ring_attention import ring_attention

            o = ring_attention(q, k, v, valid, seq_mesh, axis="seq")
            o = o.reshape(B, T, cfg.n_heads * cfg.head_dim).astype(dtype)
        elif T >= _CHUNK_ATTN_MIN_T:
            o = _attention_chunked(q, k, v, mask, dtype)
        else:
            o = _attention_full(q, k, v, mask, dtype)
        x = x + jnp.dot(o, layer["wo"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        return x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                        cfg.moe_top_k)

    for layer in dec["layers"]:
        x = _layer(x, layer)

    x = _rmsnorm(x, dec["ln_f"])
    return jnp.dot(x, dec["embed"].T.astype(dtype),
                   preferred_element_type=jnp.float32).astype(jnp.float32)


def caption_loss(params: Dict, cfg: VLMConfig, ids: jax.Array,
                 images: Optional[jax.Array],
                 loss_mask: jax.Array) -> jax.Array:
    """Next-token CE over positions where loss_mask[t+1] is set (caption
    tokens only — prompt/image positions don't contribute)."""
    logits = forward_logits(params, cfg, ids, images)
    targets = ids[:, 1:]
    lm = loss_mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * lm).sum() / jnp.maximum(lm.sum(), 1.0)


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: VLMConfig, optimizer=None, mesh=None,
                    param_shardings=None):
    """Build a jitted (optionally mesh-sharded) train step.

    With a mesh: parameters keep their TP shardings, the batch shards over
    ``data``, and gradient reductions ride ICI collectives inserted by
    GSPMD — no hand-written psum.
    """
    optimizer = optimizer or make_optimizer()

    def step(state: TrainState, ids, images, loss_mask):
        loss, grads = jax.value_and_grad(caption_loss)(
            state.params, cfg, ids, images, loss_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    dsh = NamedSharding(mesh, P("data"))
    # The TrainState keeps whatever shardings its arrays carry (params are
    # placed with TP shardings via parallel.mesh.shard_params; optimizer
    # state inherits them at init).  Only the batch is constrained here —
    # GSPMD propagates the rest and inserts the gradient all-reduces.
    return jax.jit(
        step,
        in_shardings=(None, dsh, dsh, dsh),
        donate_argnums=(0,),
    )


def init_train_state(params, optimizer=None) -> TrainState:
    optimizer = optimizer or make_optimizer()
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
