"""Autoregressive transformer decoder with a paged KV cache.

The language half of the on-TPU VLM (BASELINE.json: "autoregressive
caption decoding ... paged KV cache").  Gemma-style architecture: RMSNorm,
rotary embeddings, grouped-query attention, SwiGLU MLP, tied LM head.

Paged KV cache
--------------
Physical cache = (layers, num_pages, page_size, kv_heads, head_dim) pools
for K and V; a per-sequence block table maps logical pages -> physical
pages.  Sequences allocate pages on demand (the serving engine owns the
allocator, `msc_tpu/serving/engine.py`), so HBM scales with *live* tokens,
not max_seq_len * batch.  Decode gathers each sequence's pages with one
take along the page axis — contiguous reads sized by the block table.

All functions are functional (params/cache in, cache out) so they jit,
shard with pjit, and differentiate for the training path.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from msc_tpu.config import VLMConfig


class KVCache(NamedTuple):
    """Paged KV cache state (a pytree, jit-friendly).

    ``k_pages``/``v_pages`` are per-layer TUPLES of (P, page, KV, hd)
    pools (not one stacked (L, ...) array): the Pallas paged-attention
    kernel updates each layer's pool in place via input/output aliasing,
    and a stacked array would force a full-pool copy at the
    ``at[li].set`` seam.
    """

    k_pages: tuple           # L x (P, page, KV*hd) — merged lane dim
    v_pages: tuple           # L x (P, page, KV*hd)
    block_tables: jax.Array  # (B, max_pages_per_seq) int32, -1 = unallocated
    lengths: jax.Array       # (B,) int32 tokens written per sequence


class ContigCache(NamedTuple):
    """Contiguous per-call KV cache (left-padded batch, uniform write
    position).

    The fast decode layout: every row writes at the same ``pos`` via
    dynamic-update-slice, which XLA updates in place — unlike the paged
    layout's vector-indexed scatters, which copy the whole pool per step
    (measured ~5.5 ms/step at a 400 MB pool vs <1 ms contiguous).  RoPE is
    relative, so left-padding keeps positions exact.  The paged layout
    remains the allocator-level design for ragged continuous batching;
    a Pallas in-place paged-attention kernel is the planned unification.
    """

    k: jax.Array      # (L, B, Tmax, KV, hd)
    v: jax.Array      # (L, B, Tmax, KV, hd)
    valid: jax.Array  # (B, Tmax) bool — attendable positions
    pos: jax.Array    # scalar int32 — next write position (uniform)


def init_decoder_params(key, cfg: VLMConfig) -> Dict:
    D = cfg.d_model
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 2 + cfg.n_layers)
    params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, D)) * 0.02,
        "ln_f": jnp.ones((D,)),
        "img_proj": jax.random.normal(keys[1], (cfg.vit_width, D)) * cfg.vit_width ** -0.5,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[2 + i], 8)
        layer = {
            "ln1": jnp.ones((D,)),
            "ln2": jnp.ones((D,)),
            "wq": jax.random.normal(lk[0], (D, H * hd)) * D ** -0.5,
            "wk": jax.random.normal(lk[1], (D, KV * hd)) * D ** -0.5,
            "wv": jax.random.normal(lk[2], (D, KV * hd)) * D ** -0.5,
            "wo": jax.random.normal(lk[3], (H * hd, D)) * (H * hd) ** -0.5,
        }
        M = cfg.mlp_hidden
        if cfg.n_experts > 0:
            E = cfg.n_experts
            layer["router"] = jax.random.normal(lk[7], (D, E)) * D ** -0.5
            layer["we_gate"] = jax.random.normal(lk[4], (E, D, M)) * D ** -0.5
            layer["we_up"] = jax.random.normal(lk[5], (E, D, M)) * D ** -0.5
            layer["we_down"] = jax.random.normal(lk[6], (E, M, D)) * M ** -0.5
        else:
            layer["w_gate"] = jax.random.normal(lk[4], (D, M)) * D ** -0.5
            layer["w_up"] = jax.random.normal(lk[5], (D, M)) * D ** -0.5
            layer["w_down"] = jax.random.normal(lk[6], (M, D)) * M ** -0.5
        params["layers"].append(layer)
    return params


def init_kv_cache(cfg: VLMConfig, batch: int, num_pages: int,
                  max_pages_per_seq: int, dtype=jnp.bfloat16) -> KVCache:
    L, KV, hd, pg = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim, cfg.page_size
    # (KV, hd) merged into one 128-aligned lane dim: the Pallas paged
    # kernel's DMA/matmul alignment requirement (ops/paged_attention.py)
    return KVCache(
        k_pages=tuple(jnp.zeros((num_pages, pg, KV * hd), dtype)
                      for _ in range(L)),
        v_pages=tuple(jnp.zeros((num_pages, pg, KV * hd), dtype)
                      for _ in range(L)),
        block_tables=jnp.full((batch, max_pages_per_seq), -1, jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def pack_for_decode(dparams: Dict) -> Dict:
    """Add per-layer packed projection weights for the serving decode step.

    The decode step runs on a (B, 1, D) activation — each projection
    matmul is a tiny dispatch whose fixed cost rivals its math, so the
    engine packs q|k|v into one (D, (H+2*KV)*hd) matrix and gate|up into
    one (D, 2*M): 5 weight reads/launches per layer instead of 8.  The
    unpacked weights stay (prefill and training read them); the packed
    copies are decode-only so per-step HBM traffic is unchanged.
    Single-chip serving only — the TP mesh shards the unpacked names
    (parallel/mesh.py).
    """
    out = dict(dparams)
    layers = []
    for layer in dparams["layers"]:
        L = dict(layer)
        L["wqkv"] = jnp.concatenate(
            [layer["wq"], layer["wk"], layer["wv"]], axis=1)
        if "w_gate" in layer:
            L["w_gu"] = jnp.concatenate(
                [layer["w_gate"], layer["w_up"]], axis=1)
        layers.append(L)
    out["layers"] = layers
    return out


def _proj_qkv(layer, h, dtype, H, KV, hd):
    """(..., D) -> q (..., H*hd), k (..., KV*hd), v (..., KV*hd), using
    the packed wqkv when present (decode fast path)."""
    if "wqkv" in layer:
        qkv = jnp.dot(h, layer["wqkv"].astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)
        return (qkv[..., : H * hd],
                qkv[..., H * hd: (H + KV) * hd],
                qkv[..., (H + KV) * hd:])
    q = jnp.dot(h, layer["wq"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    k = jnp.dot(h, layer["wk"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    v = jnp.dot(h, layer["wv"].astype(dtype),
                preferred_element_type=jnp.float32).astype(dtype)
    return q, k, v


def _rmsnorm(x, scale):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6)
    return (y * scale).astype(x.dtype)


def _rope(x, positions, theta: float):
    """Rotary embedding. x: (..., T, H, hd); positions: (..., T)."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[..., None].astype(jnp.float32) * freqs  # (..., T, half)
    cos = jnp.cos(ang)[..., None, :]
    sin = jnp.sin(ang)[..., None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _mlp(layer, x, dtype, top_k: int = 2, packed: bool = False):
    if "router" in layer:
        return _moe_ffn(layer, x, dtype, top_k)
    if packed and "w_gu" in layer:
        M = layer["w_down"].shape[0]
        gu = jnp.dot(x, layer["w_gu"].astype(dtype),
                     preferred_element_type=jnp.float32)
        g, u = gu[..., :M], gu[..., M:]
    else:
        g = jnp.dot(x, layer["w_gate"].astype(dtype),
                    preferred_element_type=jnp.float32)
        u = jnp.dot(x, layer["w_up"].astype(dtype),
                    preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(dtype)
    return jnp.dot(h, layer["w_down"].astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)


def _moe_ffn(layer, x, dtype, top_k: int, dispatch: str = "capacity",
             capacity_factor: float = 1.5):
    """Top-k mixture-of-experts SwiGLU.

    dispatch="capacity" (default): sort-based token dispatch into
    per-expert buffers of capacity C = ceil(N * top_k / E *
    capacity_factor) — each token's FFN FLOPs are O(top_k), not O(E)
    (round-1 VERDICT item 8: dense dispatch bought capacity, no
    efficiency).  Tokens overflowing an expert's buffer drop that
    expert's contribution (standard Switch/GShard semantics); with ample
    capacity the result equals dense dispatch exactly (tested).

    dispatch="dense": every expert computes on every token and a
    top-k-masked softmax combines them — exact, O(E), kept as the
    reference semantics / fallback.

    The expert dimension shards over the mesh "expert" axis either way
    (the batched per-expert einsums partition on E).

    x: (B, T, D) -> (B, T, D).
    """
    if dispatch == "capacity":
        return _moe_ffn_capacity(layer, x, dtype, top_k, capacity_factor)
    E = layer["we_gate"].shape[0]
    logits = jnp.dot(x, layer["router"].astype(dtype),
                     preferred_element_type=jnp.float32)       # (B,T,E)
    # top-k mask + renormalized softmax over the selected experts
    thresh = jax.lax.top_k(logits, top_k)[0][..., -1:]
    masked = jnp.where(logits >= thresh, logits, -jnp.inf)
    w = jax.nn.softmax(masked, axis=-1).astype(dtype)           # (B,T,E)

    g = jnp.einsum("btd,edm->btem", x, layer["we_gate"].astype(dtype),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("btd,edm->btem", x, layer["we_up"].astype(dtype),
                   preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(dtype)
    y = jnp.einsum("btem,emd->bted", h, layer["we_down"].astype(dtype),
                   preferred_element_type=jnp.float32)          # (B,T,E,D)
    return jnp.einsum("bted,bte->btd", y.astype(dtype), w,
                      preferred_element_type=jnp.float32).astype(dtype)


def _moe_ffn_capacity(layer, x, dtype, top_k: int,
                      capacity_factor: float) -> jax.Array:
    """Sort-based capacity dispatch (see _moe_ffn docstring).

    Static shapes throughout: N*k routed pairs sort by expert id, each
    pair gets a rank within its expert's group, pairs with rank >= C
    scatter to a dummy slot.  Expert FFNs run as batched (E, C, .)
    einsums on the MXU; outputs gather back to token order and combine
    with the routing weights.
    """
    B, T, D = x.shape
    E = layer["we_gate"].shape[0]
    N = B * T
    C = max(1, int(-(-N * top_k * capacity_factor // E)))
    C = min(C, N)  # no expert can receive more than every token

    xf = x.reshape(N, D)
    logits = jnp.dot(xf, layer["router"].astype(dtype),
                     preferred_element_type=jnp.float32)      # (N, E)
    topv, tope = jax.lax.top_k(logits, top_k)                 # (N, k)
    w = jax.nn.softmax(topv, axis=-1).astype(jnp.float32)     # renormalized

    flat_e = tope.reshape(N * top_k)                          # expert ids
    flat_w = w.reshape(N * top_k)
    flat_tok = jnp.repeat(jnp.arange(N), top_k)

    order = jnp.argsort(flat_e, stable=True)                  # group by expert
    e_sorted = flat_e[order]
    tok_sorted = flat_tok[order]
    w_sorted = flat_w[order]
    # rank within the expert group = index - first index of that expert
    first = jnp.searchsorted(e_sorted, e_sorted, side="left")
    rank = jnp.arange(N * top_k) - first
    slot = jnp.where(rank < C, e_sorted * C + rank, E * C)    # overflow slot

    # per-expert buffers (+1 dummy row for overflow)
    buf = jnp.zeros((E * C + 1, D), dtype).at[slot].set(
        xf[tok_sorted].astype(dtype))
    xe = buf[: E * C].reshape(E, C, D)

    g = jnp.einsum("ecd,edm->ecm", xe, layer["we_gate"].astype(dtype),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("ecd,edm->ecm", xe, layer["we_up"].astype(dtype),
                   preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(dtype)
    ye = jnp.einsum("ecm,emd->ecd", h, layer["we_down"].astype(dtype),
                    preferred_element_type=jnp.float32)       # (E, C, D)

    ye_flat = jnp.concatenate(
        [ye.reshape(E * C, D), jnp.zeros((1, D), ye.dtype)], axis=0)
    contrib = ye_flat[slot] * w_sorted[:, None]               # (N*k, D)
    out = jnp.zeros((N, D), jnp.float32).at[tok_sorted].add(
        contrib.astype(jnp.float32))
    return out.reshape(B, T, D).astype(dtype)


def embed_tokens(params: Dict, ids: jax.Array, img_embeds: jax.Array | None,
                 img_token_id: int, dtype=jnp.bfloat16) -> jax.Array:
    """Token ids -> embeddings, splicing projected image embeddings into
    the IMG placeholder positions (PaLI-style early fusion).

    img_embeds: (B, N_img_total, vit_width) or None; consumed in order by
    the IMG placeholders of each row.
    """
    emb = params["embed"].astype(dtype)[ids]
    if img_embeds is None:
        return emb
    proj = jnp.dot(img_embeds.astype(dtype), params["img_proj"].astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)
    is_img = ids == img_token_id
    # k-th IMG placeholder in a row <- k-th projected image embedding
    order = jnp.cumsum(is_img, axis=1) - 1
    order = jnp.clip(order, 0, proj.shape[1] - 1)
    gathered = jnp.take_along_axis(proj, order[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered, emb)


def _attention_full(q, k, v, mask, dtype):
    """Full (prefill) GQA attention.  q: (B,T,H,hd), k/v: (B,T,KV,hd),
    mask: (B,T,T) bool (True = attend)."""
    B, T, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    q = q.reshape(B, T, KV, G, hd)
    att = jnp.einsum("btkgd,bskd->bkgts", q, k,
                     preferred_element_type=jnp.float32) * hd ** -0.5
    att = jnp.where(mask[:, None, None], att, -1e30)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bkgts,bskd->btkgd", att.astype(dtype), v,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, T, H * hd).astype(dtype)


def prefill(params: Dict, cfg: VLMConfig, ids: jax.Array,
            img_embeds: jax.Array | None, cache: KVCache,
            pad_id: int, img_token_id: int) -> Tuple[jax.Array, KVCache]:
    """Run the prompt through the decoder, writing K/V into the paged cache.

    ids: (B, T) right-padded with pad_id.  T must be a multiple of
    cfg.page_size; block_tables[:, :T/page] must be pre-allocated.

    Returns (logits_last (B, vocab), cache').
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, T = ids.shape
    pg = cfg.page_size
    n_pages = T // pg
    valid = ids != pad_id
    lengths = valid.sum(axis=1).astype(jnp.int32)
    positions = jnp.arange(T)[None, :].astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)

    x = embed_tokens(params, ids, img_embeds, img_token_id, dtype)
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = causal[None] & valid[:, None, :]

    k_pages, v_pages = list(cache.k_pages), list(cache.v_pages)
    bt = cache.block_tables

    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["ln1"])
        q = jnp.dot(h, layer["wq"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        k = jnp.dot(h, layer["wk"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        v = jnp.dot(h, layer["wv"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        q = q.reshape(B, T, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        # write K/V into this layer's pages: (B, n_pages) physical ids
        pages = bt[:, :n_pages]
        kvd = cfg.n_kv_heads * cfg.head_dim
        k_resh = k.reshape(B, n_pages, pg, kvd)
        v_resh = v.reshape(B, n_pages, pg, kvd)
        k_pages[li] = k_pages[li].at[pages].set(
            k_resh.astype(k_pages[li].dtype))
        v_pages[li] = v_pages[li].at[pages].set(
            v_resh.astype(v_pages[li].dtype))

        o = _attention_full(q, k, v, mask, dtype)
        o = jnp.dot(o, layer["wo"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        x = x + o
        x = x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                     cfg.moe_top_k)

    x = _rmsnorm(x, params["ln_f"])
    # logits at each sequence's last valid position
    last = jnp.clip(lengths - 1, 0, T - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = jnp.dot(x_last, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    new_cache = KVCache(tuple(k_pages), tuple(v_pages), bt, lengths)
    return logits.astype(jnp.float32), new_cache


def prefill_suffix(params: Dict, cfg: VLMConfig, ids: jax.Array,
                   img_embeds: jax.Array | None, cache: KVCache,
                   prefix_len: int, pad_id: int, img_token_id: int
                   ) -> Tuple[jax.Array, KVCache]:
    """Prefill only a SUFFIX against shared, already-filled prefix pages.

    Prefix caching (ROADMAP round-1: repeated system prompts are ~40% of
    prefill): every row's block table starts with the same read-only
    prefix pages (tokens 0..prefix_len-1, prefill'd once by the engine
    and never written here); ``ids`` holds just the per-request suffixes
    (B, Ts) RIGHT-padded.  Suffix K/V land in each row's own pages;
    attention runs suffix-queries x (prefix + causal suffix).

    prefix_len must be a page multiple (the engine shares only whole
    pages).  Returns (logits at each row's last valid position, cache
    with lengths = prefix_len + suffix lengths).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, Ts = ids.shape
    pg = cfg.page_size
    assert prefix_len % pg == 0 and Ts % pg == 0
    n_pre = prefix_len // pg
    n_suf = Ts // pg
    valid_suffix = ids != pad_id
    suf_lengths = valid_suffix.sum(axis=1).astype(jnp.int32)
    positions = prefix_len + jnp.broadcast_to(
        jnp.arange(Ts, dtype=jnp.int32)[None], (B, Ts))

    x = embed_tokens(params, ids, img_embeds, img_token_id, dtype)

    k_pages, v_pages = list(cache.k_pages), list(cache.v_pages)
    bt = cache.block_tables
    Tk = (n_pre + n_suf) * pg  # attended span: prefix + suffix pages
    bt_att = jnp.maximum(bt[:, : n_pre + n_suf], 0)

    # mask over the gathered span: prefix keys always attend; suffix keys
    # attend causally where valid
    key_idx = jnp.arange(Tk)
    is_prefix = key_idx < prefix_len
    causal = (key_idx[None, :] - prefix_len) <= jnp.arange(Ts)[:, None]
    suf_valid_k = jnp.concatenate(
        [jnp.ones((B, prefix_len), bool), valid_suffix], axis=1)
    mask = (is_prefix[None, None, :]
            | (causal[None] & suf_valid_k[:, None, :]))

    KV, G, hd = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads, cfg.head_dim
    own_pages = bt[:, n_pre: n_pre + n_suf]

    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["ln1"])
        q = jnp.dot(h, layer["wq"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        k = jnp.dot(h, layer["wk"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        v = jnp.dot(h, layer["wv"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        q = _rope(q.reshape(B, Ts, cfg.n_heads, hd), positions,
                  cfg.rope_theta)
        k = _rope(k.reshape(B, Ts, KV, hd), positions, cfg.rope_theta)
        v = v.reshape(B, Ts, KV, hd)

        k_resh = k.reshape(B, n_suf, pg, KV * hd)
        v_resh = v.reshape(B, n_suf, pg, KV * hd)
        k_pages[li] = k_pages[li].at[own_pages].set(
            k_resh.astype(k_pages[li].dtype))
        v_pages[li] = v_pages[li].at[own_pages].set(
            v_resh.astype(v_pages[li].dtype))

        ks = k_pages[li][bt_att].reshape(B, Tk, KV, hd).astype(dtype)
        vs = v_pages[li][bt_att].reshape(B, Tk, KV, hd).astype(dtype)
        qg = q.reshape(B, Ts, KV, G, hd)
        att = jnp.einsum("btkgd,bskd->bkgts", qg, ks,
                         preferred_element_type=jnp.float32) * hd ** -0.5
        att = jnp.where(mask[:, None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bkgts,bskd->btkgd", att.astype(dtype), vs,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, Ts, cfg.n_heads * hd).astype(dtype)
        x = x + jnp.dot(o, layer["wo"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        x = x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                     cfg.moe_top_k)

    x = _rmsnorm(x, params["ln_f"])
    last = jnp.clip(suf_lengths - 1, 0, Ts - 1)
    x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
    logits = jnp.dot(x_last, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    new_cache = KVCache(tuple(k_pages), tuple(v_pages), bt,
                        prefix_len + suf_lengths)
    return logits.astype(jnp.float32), new_cache


def prefill_contig(params: Dict, cfg: VLMConfig, ids: jax.Array,
                   img_embeds: jax.Array | None, t_max: int,
                   pad_id: int, img_token_id: int,
                   kv_dtype=None, seq_mesh=None) -> Tuple[jax.Array, ContigCache]:
    """Prefill into a contiguous cache.  ids: (B, T) LEFT-padded.

    seq_mesh: optional Mesh with a ``seq`` axis — prefill attention runs
    as ring attention with the sequence sharded over it (sequence
    parallelism for multi-chip prompts, SURVEY.md section 2.3 item 5;
    round-1 had this only in the training forward).  T must divide by
    the axis size (the engine's prompt buckets are 128-multiples).
    Token-identical to the single-chip path.

    Returns (logits at the last column (B, vocab), cache with pos=T).
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    kv_dtype = kv_dtype or dtype
    B, T = ids.shape
    valid_prompt = ids != pad_id
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    x = embed_tokens(params, ids, img_embeds, img_token_id, dtype)

    # Flash (Pallas) prefill attention (msc_tpu/ops/attention.py): streams
    # KV blocks through VMEM with an online softmax.  Measured on v5e at
    # the default model scale (B=6, T=2048, H=8, hd=64, bf16) it is at
    # parity with XLA's fused einsum attention (3.9 vs 3.6 ms), so it is
    # opt-in (MSC_FLASH_ATTENTION=1) until the larger model families make
    # the O(T^2) HBM savings bite.
    import os

    use_flash = (seq_mesh is None
                 and os.environ.get("MSC_FLASH_ATTENTION") == "1"
                 and T >= 256 and T % 128 == 0
                 and jax.default_backend() != "cpu")
    if not use_flash and seq_mesh is None:
        mask = (jnp.tril(jnp.ones((T, T), bool))[None]
                & valid_prompt[:, None, :])

    L = cfg.n_layers
    k_cache = jnp.zeros((L, B, t_max, cfg.n_kv_heads, cfg.head_dim), kv_dtype)
    v_cache = jnp.zeros_like(k_cache)

    for li, layer in enumerate(params["layers"]):
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
        k_cache = k_cache.at[li, :, :T].set(k.astype(kv_dtype))
        v_cache = v_cache.at[li, :, :T].set(v.astype(kv_dtype))
        if seq_mesh is not None:
            from msc_tpu.parallel.ring_attention import ring_attention

            o = ring_attention(q, k, v, valid_prompt, seq_mesh, axis="seq")
            o = o.reshape(B, T, cfg.n_heads * cfg.head_dim).astype(dtype)
        elif use_flash:
            from msc_tpu.ops.attention import flash_prefill_attention

            o = flash_prefill_attention(q, k, v, valid_prompt)
            o = o.reshape(B, T, cfg.n_heads * cfg.head_dim).astype(dtype)
        else:
            o = _attention_full(q, k, v, mask, dtype)
        x = x + jnp.dot(o, layer["wo"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        x = x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                     cfg.moe_top_k)

    x = _rmsnorm(x[:, -1], params["ln_f"])  # left-padded: last col is real
    logits = jnp.dot(x, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    valid = jnp.zeros((B, t_max), bool).at[:, :T].set(valid_prompt)
    cache = ContigCache(k_cache, v_cache, valid, jnp.int32(T))
    return logits.astype(jnp.float32), cache


def decode_step_contig(params: Dict, cfg: VLMConfig, tokens: jax.Array,
                       cache: ContigCache) -> Tuple[jax.Array, ContigCache]:
    """One decode step, contiguous layout: every row writes at cache.pos.

    (A whole-stack fused Pallas kernel variant of this step was
    prototyped and retired in round 3 — it lost to this packed-XLA step,
    216 vs 177 us, and its grouped-matmul rewrite hit Mosaic lowering
    limits on v5e; the measured study lives in PERF.md.)
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B = tokens.shape[0]
    Tmax = cache.k.shape[2]
    pos = cache.pos

    x = params["embed"].astype(dtype)[tokens][:, None, :]
    k_cache, v_cache = cache.k, cache.v
    valid = cache.valid.at[:, pos].set(True)
    kv_mask = valid  # includes self at pos

    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["ln1"])
        q, k, v = _proj_qkv(layer, h, dtype, cfg.n_heads, cfg.n_kv_heads,
                            cfg.head_dim)
        q = _rope(q.reshape(B, 1, cfg.n_heads, cfg.head_dim),
                  pos[None, None], cfg.rope_theta)
        k = _rope(k.reshape(B, 1, cfg.n_kv_heads, cfg.head_dim),
                  pos[None, None], cfg.rope_theta)
        v = v.reshape(B, 1, cfg.n_kv_heads, cfg.head_dim)

        # uniform-position write -> dynamic-update-slice, in place
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (li, 0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (li, 0, pos, 0, 0))

        KV, G, hd = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads, cfg.head_dim
        qg = q.reshape(B, KV, G, hd)
        ks = k_cache[li].astype(dtype)
        vs = v_cache[li].astype(dtype)
        att = jnp.einsum("bkgd,bskd->bkgs", qg, ks,
                         preferred_element_type=jnp.float32) * hd ** -0.5
        att = jnp.where(kv_mask[:, None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bkgs,bskd->bkgd", att.astype(dtype), vs,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B, 1, cfg.n_heads * hd).astype(dtype)
        x = x + jnp.dot(o, layer["wo"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        x = x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                     cfg.moe_top_k, packed=True)

    x = _rmsnorm(x, params["ln_f"])[:, 0]
    logits = jnp.dot(x, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32), ContigCache(k_cache, v_cache, valid,
                                                   pos + 1)


def decode_step(params: Dict, cfg: VLMConfig, tokens: jax.Array,
                cache: KVCache, use_pallas: bool = False
                ) -> Tuple[jax.Array, KVCache]:
    """One decode step for all sequences.

    tokens: (B,) int32 current input tokens.
    use_pallas: route attention + page writes through the fused Pallas
    paged-attention kernel (`msc_tpu/ops/paged_attention.py`) — in-place
    pool updates, O(live tokens) HBM traffic.  False = pure-XLA fallback
    (CPU tests; identical numerics up to matmul precision).
    Returns (logits (B, vocab), cache') with lengths advanced by 1.
    Block tables must already cover position lengths[b].
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B = tokens.shape[0]
    pg = cfg.page_size
    max_pages = cache.block_tables.shape[1]
    Tmax = max_pages * pg
    pos = cache.lengths  # (B,) position being written

    x = params["embed"].astype(dtype)[tokens][:, None, :]  # (B, 1, D)

    k_pages, v_pages = list(cache.k_pages), list(cache.v_pages)
    bt = cache.block_tables
    page_idx = jnp.take_along_axis(bt, (pos // pg)[:, None], axis=1)[:, 0]
    offset = pos % pg

    kv_mask = (jnp.arange(Tmax)[None, :] <= pos[:, None])  # attend incl. self
    KV, G, hd = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads, cfg.head_dim

    for li, layer in enumerate(params["layers"]):
        h = _rmsnorm(x, layer["ln1"])
        q = jnp.dot(h, layer["wq"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        k = jnp.dot(h, layer["wk"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        v = jnp.dot(h, layer["wv"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        q = q.reshape(B, 1, cfg.n_heads, cfg.head_dim)
        k = k.reshape(B, 1, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(B, 1, cfg.n_kv_heads, cfg.head_dim)
        q = _rope(q, pos[:, None], cfg.rope_theta)
        k = _rope(k, pos[:, None], cfg.rope_theta)

        if use_pallas:
            from msc_tpu.ops.paged_attention import paged_decode_attention

            o, k_pages[li], v_pages[li] = paged_decode_attention(
                q[:, 0], k[:, 0].astype(k_pages[li].dtype),
                v[:, 0].astype(v_pages[li].dtype),
                k_pages[li], v_pages[li], jnp.maximum(bt, 0), pos)
            o = o.reshape(B, 1, cfg.n_heads * hd).astype(dtype)
        else:
            # scatter new K/V into pages at (page_idx, offset) — this
            # functional update copies the pool (the Pallas path exists
            # precisely to avoid it)
            k_pages[li] = k_pages[li].at[page_idx, offset].set(
                k[:, 0].reshape(B, KV * hd).astype(k_pages[li].dtype))
            v_pages[li] = v_pages[li].at[page_idx, offset].set(
                v[:, 0].reshape(B, KV * hd).astype(v_pages[li].dtype))

            # gather this sequence's pages: (B, max_pages, pg, KV*hd)
            bt_safe = jnp.maximum(bt, 0)
            ks = k_pages[li][bt_safe].reshape(B, Tmax, KV, hd)
            vs = v_pages[li][bt_safe].reshape(B, Tmax, KV, hd)

            qg = q.reshape(B, KV, G, hd)
            att = jnp.einsum("bkgd,bskd->bkgs", qg, ks,
                             preferred_element_type=jnp.float32) * hd ** -0.5
            att = jnp.where(kv_mask[:, None, None], att, -1e30)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bkgs,bskd->bkgd", att.astype(dtype), vs,
                           preferred_element_type=jnp.float32)
            o = o.reshape(B, 1, cfg.n_heads * hd).astype(dtype)
        o = jnp.dot(o, layer["wo"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        x = x + o
        x = x + _mlp(layer, _rmsnorm(x, layer["ln2"]), dtype,
                     cfg.moe_top_k, packed=True)

    x = _rmsnorm(x, params["ln_f"])[:, 0]
    logits = jnp.dot(x, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    new_cache = KVCache(tuple(k_pages), tuple(v_pages), bt, cache.lengths + 1)
    return logits.astype(jnp.float32), new_cache
