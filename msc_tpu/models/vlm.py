"""The on-TPU VLM: ViT encoder + paged-KV decoder + generation loop.

Replaces the reference's Azure OpenAI vision/chat calls
(`src/agents/base_agent.py:14-58`) with a local JAX model.  One
``generate`` call covers both `chat.completions.create` (free text) and
`chat.completions.parse` (schema-constrained JSON via a byte-level DFA).

The whole decode loop is a single jitted `lax.while_loop` — prefill once,
then one fused decode step per token with early exit when every row hit
EOS.  Sharding-ready: all ops are batched matmuls/gathers that pjit can
partition over a (data, model) mesh (see msc_tpu/parallel).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from msc_tpu.config import VLMConfig
from msc_tpu.models import decoder as dec
from msc_tpu.models import vit as vit_mod
from msc_tpu.models.sampling import FSM, sample_token
from msc_tpu.models.tokenizer import EOS_ID, IMG_ID, PAD_ID


def init_vlm_params(key, cfg: VLMConfig) -> Dict:
    k1, k2 = jax.random.split(key)
    return {"vit": vit_mod.init_vit_params(k1, cfg),
            "dec": dec.init_decoder_params(k2, cfg)}


class GenerateResult(NamedTuple):
    tokens: jax.Array   # (B, max_new) int32, PAD after EOS
    lengths: jax.Array  # (B,) int32 generated-token counts (excl. EOS)


class VLM:
    """Convenience wrapper owning jitted prefill/decode/generate closures.

    seq_mesh: optional Mesh with a ``seq`` axis — contiguous-path prefill
    attention runs as ring attention with the sequence sharded over it
    (serving-side sequence parallelism; token-identical to single-chip).
    """

    def __init__(self, cfg: VLMConfig, params: Dict, seq_mesh=None):
        self.cfg = cfg
        self.params = params
        self.seq_mesh = seq_mesh
        self._encode = jax.jit(
            lambda p, imgs: vit_mod.vit_encode(p, imgs, cfg))
        # fused uint8 -> resize/normalize -> ViT in ONE dispatch (each
        # dispatch is a tunnel RPC; see msc_tpu/serving/engine.py)
        from msc_tpu.ops.image import preprocess_images

        self._pre_encode = jax.jit(
            lambda p, raw: vit_mod.vit_encode(
                p, preprocess_images(raw, size=cfg.image_size), cfg))
        # params passed as a real argument (NOT closure/static: that would
        # bake 10^7 weights into the HLO as constants and explode compile
        # time); the cache is donated so the paged pools update in place.
        # Paged decode routes through the Pallas kernel on TPU backends
        # (in-place page writes); CPU keeps the XLA fallback.
        import os

        self.use_pallas_paged = (
            os.environ.get("MSC_PALLAS_PAGED", "1") == "1"
            and jax.default_backend() != "cpu")
        self._generate_fn = jax.jit(
            functools.partial(_generate_impl, cfg,
                              use_pallas=self.use_pallas_paged),
            static_argnames=("max_new_tokens", "use_fsm", "length_bias"),
            donate_argnames=("cache",),
        )
        self._generate_contig_fn = jax.jit(
            functools.partial(_generate_contig_impl, cfg,
                              seq_mesh=seq_mesh),
            static_argnames=("t_max", "max_new_tokens", "use_fsm",
                             "length_bias"),
        )
        from msc_tpu.models.block_decode import generate_contig_block_impl

        self._generate_contig_block_fn = jax.jit(
            functools.partial(generate_contig_block_impl, cfg,
                              seq_mesh=seq_mesh),
            static_argnames=("t_max", "max_new_tokens", "use_fsm",
                             "length_bias", "W"),
        )
        self._generate_prefix_fn = jax.jit(
            functools.partial(_generate_prefix_impl, cfg,
                              use_pallas=self.use_pallas_paged),
            static_argnames=("prefix_len", "max_new_tokens", "use_fsm",
                             "length_bias"),
            donate_argnames=("cache",),
        )
        self._prefill_fn = jax.jit(
            functools.partial(dec.prefill, cfg=cfg, pad_id=PAD_ID,
                              img_token_id=IMG_ID),
            donate_argnames=("cache",),
        )

    def encode_images(self, images: jax.Array) -> jax.Array:
        """(N, S, S, 3) float -> (N, tokens_per_image, vit_width)."""
        return self._encode(self.params["vit"], images)

    def preprocess_and_encode(self, raw: jax.Array) -> jax.Array:
        """(N, H, W, 3) any-dtype raw frames -> embeddings, one dispatch."""
        return self._pre_encode(self.params["vit"], raw)

    def generate(self, ids: jax.Array, img_embeds: Optional[jax.Array],
                 cache: dec.KVCache, rng: jax.Array,
                 max_new_tokens: int = 128, temperature=0.0,
                 use_fsm: bool = False,
                 fsm_trans: Optional[jax.Array] = None,
                 fsm_accept: Optional[jax.Array] = None,
                 fsm_dist: Optional[jax.Array] = None,
                 fsm_start: Optional[jax.Array] = None,
                 length_bias: float = 0.0) -> Tuple[GenerateResult, dec.KVCache]:
        """Prefill + autoregressive decode.

        ids: (B, T) right-padded prompt, T multiple of page_size.
        img_embeds: (B, N_img, vit_width) or None.
        temperature: scalar or (B,) per-row temperatures (traced, so
        heterogeneous-temperature batches share one compiled program).
        cache: pre-allocated KVCache whose block tables cover
               T + max_new_tokens positions.  The cache is DONATED.
        """
        temps = _as_temps(temperature, ids.shape[0])
        return self._generate_fn(
            self.params, ids, img_embeds, cache, rng, temps,
            fsm_trans, fsm_accept, fsm_dist, fsm_start,
            max_new_tokens=max_new_tokens,
            use_fsm=use_fsm, length_bias=length_bias)


    def generate_contig(self, ids: jax.Array, img_embeds: Optional[jax.Array],
                        rng: jax.Array, t_max: int,
                        max_new_tokens: int = 128, temperature=0.0,
                        use_fsm: bool = False,
                        fsm_trans: Optional[jax.Array] = None,
                        fsm_accept: Optional[jax.Array] = None,
                        fsm_dist: Optional[jax.Array] = None,
                        fsm_start: Optional[jax.Array] = None,
                        length_bias: float = 0.0) -> GenerateResult:
        """Prefill + decode on the contiguous fast path.

        ids: (B, T) LEFT-padded prompt.  t_max >= T + max_new_tokens.
        """
        temps = _as_temps(temperature, ids.shape[0])
        return self._generate_contig_fn(
            self.params, ids, img_embeds, rng, temps,
            fsm_trans, fsm_accept, fsm_dist, fsm_start,
            t_max=t_max, max_new_tokens=max_new_tokens,
            use_fsm=use_fsm, length_bias=length_bias)


    def generate_contig_block(self, ids: jax.Array,
                              img_embeds: Optional[jax.Array],
                              rng: jax.Array, t_max: int,
                              max_new_tokens: int = 128, temperature=0.0,
                              use_fsm: bool = False,
                              fsm_trans=None, fsm_accept=None,
                              fsm_dist=None, fsm_start=None,
                              forced_tok=None, forced_len=None,
                              lut=None, row_active=None,
                              length_bias: float = 0.0,
                              W: int = 7) -> GenerateResult:
        """Block-speculative contiguous generate (models/block_decode.py):
        FSM forced-run fast-forward + prompt-lookup drafts, verified in
        W+1-wide block steps.  Token-identical to ``generate_contig`` for
        greedy free-text rows; text-identical (canonical segmentation) on
        DFA-forced spans.

        t_max must include bubble slack beyond T + max_new_tokens (the
        engine passes ~max_new extra; the loop guard stops at the wall).
        """
        temps = _as_temps(temperature, ids.shape[0])
        if row_active is None:
            row_active = jnp.ones((ids.shape[0],), bool)
        out, lengths, n_steps = self._generate_contig_block_fn(
            self.params, ids, img_embeds, rng, temps,
            fsm_trans, fsm_accept, fsm_dist, fsm_start,
            forced_tok, forced_len, lut, row_active,
            t_max=t_max, max_new_tokens=max_new_tokens, use_fsm=use_fsm,
            length_bias=length_bias, W=W)
        self.last_block_steps = n_steps  # device scalar; engine fetches
        return GenerateResult(out, lengths)

    def prefill_pages(self, ids: jax.Array, cache: dec.KVCache
                      ) -> dec.KVCache:
        """Prefill a (usually 1-row) prompt into paged cache pages —
        used by the engine to materialize a shared PREFIX once; the
        resulting pages are then referenced read-only by every request's
        block table (prefix caching)."""
        _logits, cache = self._prefill_fn(self.params["dec"], ids=ids,
                                          img_embeds=None, cache=cache)
        return cache

    def generate_prefix(self, ids_suffix: jax.Array, cache: dec.KVCache,
                        rng: jax.Array, prefix_len: int,
                        max_new_tokens: int = 128, temperature=0.0,
                        use_fsm: bool = False, fsm_trans=None,
                        fsm_accept=None, fsm_dist=None, fsm_start=None,
                        length_bias: float = 0.0):
        """Suffix-only prefill over shared prefix pages + paged decode.

        ids_suffix: (B, Ts) RIGHT-padded suffixes; block tables must lead
        with the shared prefix pages (prefix_len a page multiple).  The
        cache is DONATED.
        """
        temps = _as_temps(temperature, ids_suffix.shape[0])
        return self._generate_prefix_fn(
            self.params, ids_suffix, cache, rng, temps,
            fsm_trans, fsm_accept, fsm_dist, fsm_start,
            prefix_len=prefix_len, max_new_tokens=max_new_tokens,
            use_fsm=use_fsm, length_bias=length_bias)


def _as_temps(temperature, batch: int) -> jax.Array:
    """Scalar-or-vector temperature -> (B,) float32 array."""
    t = jnp.asarray(temperature, jnp.float32)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (batch,))
    return t


def _generate_contig_impl(cfg: VLMConfig, params: Dict, ids: jax.Array,
                          img_embeds: Optional[jax.Array], rng: jax.Array,
                          temperature: jax.Array,
                          fsm_trans, fsm_accept, fsm_dist, fsm_start,
                          *, t_max: int, max_new_tokens: int,
                          use_fsm: bool,
                          length_bias: float, seq_mesh=None) -> GenerateResult:
    dparams = params["dec"]
    B = ids.shape[0]
    fsm = FSM(fsm_trans, fsm_accept, fsm_dist) if use_fsm else None

    logits, cache = dec.prefill_contig(dparams, cfg, ids, img_embeds, t_max,
                                       PAD_ID, IMG_ID, seq_mesh=seq_mesh)

    out = jnp.full((B, max_new_tokens), PAD_ID, jnp.int32)
    fsm_state = (jnp.zeros((B,), jnp.int32) if fsm_start is None
                 else jnp.asarray(fsm_start, jnp.int32))
    done = jnp.zeros((B,), bool)

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, logits, cache, out, done, fsm_state, rng = state
        rng, sub = jax.random.split(rng)
        tok, fsm_state = sample_token(
            logits, temperature, sub, fsm, fsm_state, EOS_ID,
            length_bias=length_bias,
            remaining=jnp.int32(max_new_tokens) - i - 1)
        tok = jnp.where(done, PAD_ID, tok)
        now_done = done | (tok == EOS_ID)
        out = out.at[:, i].set(jnp.where(now_done, PAD_ID, tok))
        step_tok = jnp.where(now_done, jnp.int32(PAD_ID), tok)
        logits, cache = dec.decode_step_contig(dparams, cfg, step_tok, cache)
        return i + 1, logits, cache, out, now_done, fsm_state, rng

    i, logits, cache, out, done, fsm_state, rng = jax.lax.while_loop(
        cond, body, (jnp.int32(0), logits, cache, out, done, fsm_state, rng))

    lengths = (out != PAD_ID).sum(axis=1).astype(jnp.int32)
    return GenerateResult(out, lengths)


def _generate_impl(cfg: VLMConfig, params: Dict, ids: jax.Array,
                   img_embeds: Optional[jax.Array], cache: dec.KVCache,
                   rng: jax.Array, temperature: jax.Array,
                   fsm_trans, fsm_accept, fsm_dist, fsm_start,
                   *, max_new_tokens: int,
                   use_fsm: bool, length_bias: float,
                   use_pallas: bool = False):
    dparams = params["dec"]
    B = ids.shape[0]
    fsm = FSM(fsm_trans, fsm_accept, fsm_dist) if use_fsm else None

    logits, cache = dec.prefill(dparams, cfg, ids, img_embeds, cache,
                                PAD_ID, IMG_ID)

    out = jnp.full((B, max_new_tokens), PAD_ID, jnp.int32)
    fsm_state = (jnp.zeros((B,), jnp.int32) if fsm_start is None
                 else jnp.asarray(fsm_start, jnp.int32))
    done = jnp.zeros((B,), bool)

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, logits, cache, out, done, fsm_state, rng = state
        rng, sub = jax.random.split(rng)
        tok, fsm_state = sample_token(
            logits, temperature, sub, fsm, fsm_state, EOS_ID,
            length_bias=length_bias,
            remaining=jnp.int32(max_new_tokens) - i - 1)
        tok = jnp.where(done, PAD_ID, tok)
        now_done = done | (tok == EOS_ID)
        out = out.at[:, i].set(jnp.where(now_done, PAD_ID, tok))
        # advance: feed sampled token (EOS rows keep stepping PAD but
        # are masked out of the output; cheaper than compaction)
        step_tok = jnp.where(now_done, jnp.int32(PAD_ID), tok)
        logits, cache = dec.decode_step(dparams, cfg, step_tok, cache,
                                        use_pallas=use_pallas)
        return i + 1, logits, cache, out, now_done, fsm_state, rng

    i, logits, cache, out, done, fsm_state, rng = jax.lax.while_loop(
        cond, body, (jnp.int32(0), logits, cache, out, done, fsm_state, rng))

    lengths = (out != PAD_ID).sum(axis=1).astype(jnp.int32)
    return GenerateResult(out, lengths), cache


def _generate_prefix_impl(cfg: VLMConfig, params: Dict, ids_suffix: jax.Array,
                          cache: dec.KVCache, rng: jax.Array,
                          temperature: jax.Array,
                          fsm_trans, fsm_accept, fsm_dist, fsm_start,
                          *, prefix_len: int, max_new_tokens: int,
                          use_fsm: bool, length_bias: float,
                          use_pallas: bool = False):
    """Suffix prefill over shared prefix pages + paged decode loop."""
    dparams = params["dec"]
    B = ids_suffix.shape[0]
    fsm = FSM(fsm_trans, fsm_accept, fsm_dist) if use_fsm else None

    logits, cache = dec.prefill_suffix(dparams, cfg, ids_suffix, None,
                                       cache, prefix_len, PAD_ID, IMG_ID)

    out = jnp.full((B, max_new_tokens), PAD_ID, jnp.int32)
    fsm_state = (jnp.zeros((B,), jnp.int32) if fsm_start is None
                 else jnp.asarray(fsm_start, jnp.int32))
    done = jnp.zeros((B,), bool)

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, logits, cache, out, done, fsm_state, rng = state
        rng, sub = jax.random.split(rng)
        tok, fsm_state = sample_token(
            logits, temperature, sub, fsm, fsm_state, EOS_ID,
            length_bias=length_bias,
            remaining=jnp.int32(max_new_tokens) - i - 1)
        tok = jnp.where(done, PAD_ID, tok)
        now_done = done | (tok == EOS_ID)
        out = out.at[:, i].set(jnp.where(now_done, PAD_ID, tok))
        step_tok = jnp.where(now_done, jnp.int32(PAD_ID), tok)
        logits, cache = dec.decode_step(dparams, cfg, step_tok, cache,
                                        use_pallas=use_pallas)
        return i + 1, logits, cache, out, now_done, fsm_state, rng

    i, logits, cache, out, done, fsm_state, rng = jax.lax.while_loop(
        cond, body, (jnp.int32(0), logits, cache, out, done, fsm_state, rng))

    lengths = (out != PAD_ID).sum(axis=1).astype(jnp.int32)
    return GenerateResult(out, lengths), cache


def make_cache_for(cfg: VLMConfig, batch: int, prompt_len: int,
                   max_new_tokens: int) -> dec.KVCache:
    """Allocate a cache + identity block tables covering one batched call.

    The serving engine replaces this with its page allocator; this helper
    is for direct/model-level use and tests.
    """
    pg = cfg.page_size
    pages_per_seq = -(-(prompt_len + max_new_tokens) // pg)
    num_pages = batch * pages_per_seq
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    cache = dec.init_kv_cache(cfg, batch, num_pages, pages_per_seq, dtype)
    bt = jnp.arange(num_pages, dtype=jnp.int32).reshape(batch, pages_per_seq)
    return cache._replace(block_tables=bt)


def pad_prompt(ids, pad_to_multiple: int, pad_id: int = PAD_ID):
    """Right-pad (B, T) ids so T is a multiple of the page size."""
    import numpy as np

    T = ids.shape[1]
    T_pad = -(-T // pad_to_multiple) * pad_to_multiple
    if T_pad == T:
        return ids
    out = np.full((ids.shape[0], T_pad), pad_id, dtype=ids.dtype)
    out[:, :T] = ids
    return out
