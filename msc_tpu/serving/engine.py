"""Inference engine: batched prefill/decode over the paged KV cache.

Owns the physical KV page pool and a free-list allocator; each
``generate_batch`` call allocates block tables for its requests, runs one
jitted prefill + decode loop, and frees the pages.  Prompt lengths bucket
to page multiples so XLA compiles a small, reusable set of program shapes.

This is the subsystem that replaces the reference's HTTPS round-trips to
Azure (`src/agents/base_agent.py:21-34`); the pipeline funnels
semantically-parallel agent calls (the L1 agents, the 5 seed-focus
captions, cluster-classification batches) into single batched calls here
(SURVEY.md section 7 step 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msc_tpu.config import VLMConfig
from msc_tpu.models import decoder as dec
from msc_tpu.models.tokenizer import ByteTokenizer, PAD_ID
from msc_tpu.models.vlm import VLM, init_vlm_params
from msc_tpu.serving import structured
from msc_tpu.utils.device_lock import DEVICE_LOCK


@dataclasses.dataclass
class Request:
    """One chat-completion request."""

    messages: List[dict]
    temperature: float = 0.0
    schema: Any = None            # pydantic class or spec dict, or None
    images: Sequence[np.ndarray] = ()  # referenced by image parts, in order
    max_new_tokens: int = 256


class PageAllocator:
    """Free-list allocator over the physical KV page pool."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self.free = list(range(num_pages - 1, -1, -1))

    def alloc(self, n: int) -> List[int]:
        if n > len(self.free):
            raise RuntimeError(
                f"KV page pool exhausted: need {n}, have {len(self.free)}")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: Sequence[int]):
        self.free.extend(pages)

    @property
    def used(self) -> int:
        return self.num_pages - len(self.free)


_PROMPT_BUCKETS = (256, 512, 1024, 2048)

# per-call engine telemetry (batch shape, decode lengths, wall ms)
import os as _os

_DEBUG = _os.environ.get("MSC_ENGINE_DEBUG") == "1"


class InferenceEngine:
    def __init__(self, cfg: VLMConfig, params: Optional[dict] = None,
                 seed: int = 0, num_pages: int = 2048,
                 max_pages_per_seq: int = 24, json_length_bias: float = 3.0,
                 kv_layout: str = "contiguous", mesh=None, seq_mesh=None,
                 prefix_caching: bool = True,
                 prefix_cache_pages: int = 512):
        """kv_layout: "contiguous" (fast path: left-padded batches,
        in-place uniform-position writes) or "paged" (block-table pool —
        the ragged continuous-batching layout; slower until the Pallas
        paged-attention kernel lands, see decoder.ContigCache docs).

        mesh: optional (data, model) Mesh — parameters get tensor-parallel
        shardings (msc_tpu/parallel/mesh.py) and GSPMD partitions the
        generate programs over it (attention heads / MLP hidden split over
        ``model``; the all-reduces ride ICI)."""
        self.cfg = cfg
        self.kv_layout = kv_layout
        self.json_length_bias = json_length_bias
        self.mesh = mesh
        import os as _os

        # block-speculative decoding (models/block_decode.py): FSM
        # forced-run fast-forward + prompt-lookup drafts cut sequential
        # decode steps ~1.7x on schema'd outputs / up to ~4x on the
        # copy-heavy prose tasks.  Contiguous path only; supersedes
        # prefix caching when on (everything routes contiguous).
        self.block_decode = _os.environ.get("MSC_BLOCK_DECODE", "0") == "1"
        self.spec_W = int(_os.environ.get("MSC_SPEC_W", "7"))
        self._forced_cache: Dict[int, tuple] = {}
        from msc_tpu.models.bpe import make_tokenizer

        self.tokenizer = make_tokenizer(cfg)
        if params is None:
            params = init_vlm_params(jax.random.PRNGKey(seed), cfg)
        if cfg.dtype == "bfloat16":
            # serving keeps weights in bf16: the decode loop reads every
            # parameter each step, and f32 storage + per-step astype(bf16)
            # tripled the HBM traffic (training keeps f32 masters)
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        if mesh is not None:
            from msc_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        else:
            # params MUST live on device: restored checkpoints arrive as
            # host numpy arrays, and passing those to the jitted closures
            # re-uploads the full parameter set every call (~70 MB/call
            # through the tunnel — measured 5 s/call, a 70x bench
            # regression the first time a trained checkpoint was served)
            params = jax.device_put(params)
            # single-chip serving: pack q|k|v and gate|up projections so
            # the decode step runs 5 weight matmuls/layer instead of 8
            # (the TP mesh path shards the unpacked names instead)
            params = {**params, "dec": dec.pack_for_decode(params["dec"])}
            # (A whole-stack fused Pallas decode kernel was prototyped
            # and retired in round 3: it lost to the packed-XLA step —
            # 216 vs 177 us — and its grouped-matmul rewrite hit Mosaic
            # lowering limits on v5e; see PERF.md "fused decode kernel".)
        # seq_mesh: serving-side sequence parallelism — contiguous prefill
        # attention rides ring attention over the mesh's ``seq`` axis
        self.vlm = VLM(cfg, params, seq_mesh=seq_mesh)
        self.allocator = PageAllocator(num_pages)
        self.max_pages_per_seq = max_pages_per_seq
        self._rng = jax.random.PRNGKey(seed + 1)
        self._fsm_cache: Dict[int, tuple] = {}
        # persistent device-side page pools
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._cache_template = dec.init_kv_cache(
            cfg, batch=1, num_pages=num_pages,
            max_pages_per_seq=max_pages_per_seq, dtype=dtype)
        self._k_pages = self._cache_template.k_pages
        self._v_pages = self._cache_template.v_pages
        # prefix caching: shared page-aligned prompt prefixes (system
        # prompts, per-scene caption heads) prefill ONCE into read-only
        # pages that every matching request's block table references —
        # ROADMAP round-1 estimated repeated system prompts at ~40% of
        # prefill work.  LRU-evicted when the page budget fills.
        self.prefix_caching = prefix_caching
        self._prefix_budget = prefix_cache_pages
        self._prefix_cache: Dict[tuple, List[int]] = {}  # tokens -> pages
        self._prefix_lru: List[tuple] = []
        # cumulative serving telemetry (bench reads these for tokens/sec
        # + model-FLOPs utilization; see bench.py tail)
        self.stats = {"calls": 0, "prefill_tokens": 0, "decode_tokens": 0,
                      "image_tokens": 0, "lock_s": 0.0, "wall_s": 0.0}
        import threading

        self._stats_lock = threading.Lock()

    # ------------------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in _PROMPT_BUCKETS:
            if n <= b:
                return b
        return _PROMPT_BUCKETS[-1]

    def _tokenize(self, req: Request) -> List[int]:
        ids = self.tokenizer.apply_chat_template(
            req.messages, num_image_tokens=self.cfg.tokens_per_image)
        # head+tail truncation (shared with training tokenization; the
        # reference relies on Azure's 128k window, ours is smaller).
        # IMG-aware: placeholder runs are atomic (tokenizer docstring).
        return self.tokenizer.truncate_head_tail(
            ids, _PROMPT_BUCKETS[-1], img_id=self.tokenizer.img_id)

    def generate_batch(self, requests: List[Request]) -> List[str]:
        """Run a homogeneous batch (same schema) through one
        prefill+decode program.  Returns decoded strings.

        Lock discipline: host-side prompt building (tokenize, cv2 image
        downscale) runs BEFORE the device lock; dispatch, engine-state
        mutation (page pools, prefix cache, rng) AND the blocking d2h
        fetch stay inside it.  Keeping the fetch under the lock is
        deliberate: concurrent tunnel RPCs degrade the axon dev tunnel
        pathologically (measured 12 calls in 6 minutes with overlapped
        fetches); on direct-attached TPUs the fetch is 1-3 ms so the
        forgone overlap is negligible."""
        if not requests:
            return []
        distinct = {id(r.schema): r.schema for r in requests
                    if r.schema is not None}
        assert len(distinct) <= 1, \
            "generate_batch supports at most one distinct schema per " \
            "batch (free-text rows may mix in via the permissive state)"
        schema = next(iter(distinct.values()), None)
        if len(requests) > 16:
            # the batch dim buckets at (1,2,4,8,16); an oversized batch
            # (e.g. a 19-question MQA scene) would compile its own exact-B
            # program — chunk instead (the shared-prefix pages created by
            # the first chunk are reused by the rest)
            out: List[str] = []
            for i in range(0, len(requests), 16):
                out.extend(self.generate_batch(requests[i: i + 16]))
            return out
        import time as _time

        _t0 = _time.perf_counter()
        tok_lists = [self._tokenize(r) for r in requests]
        host_images = self._prep_request_images(requests)
        host_luts = None
        if self.block_decode:
            # prompt n-gram index per row (speculative draft source) —
            # pure host work, built OUTSIDE the device lock
            from msc_tpu.models.block_decode import build_prompt_lut

            host_luts = [build_prompt_lut(t, self.spec_W)
                         for t in tok_lists]
        with DEVICE_LOCK:
            # timestamp taken INSIDE the lock so stats['lock_s'] measures
            # hold time only — taking it before the `with` would count
            # lock-WAIT under concurrency>1, double-charging waiters'
            # time against the holder and understating the pipelining
            # ceiling the bench prints (round-4 advisor finding)
            _t_lock = _time.perf_counter()
            result, meta = self._dispatch_locked(requests, schema,
                                                 tok_lists, host_images,
                                                 host_luts)
            B_real, B, T, max_new, had_prefix, img_embeds = meta
            # ONE synchronous tunnel round trip for both outputs (each
            # sync fetch costs ~27 ms over the tunnel; a tuple
            # device_get is one)
            blk_steps = getattr(self.vlm, "last_block_steps", None)
            if blk_steps is not None:
                out_tokens, lengths, blk_steps = jax.device_get(
                    (result.tokens, result.lengths, blk_steps))
            else:
                out_tokens, lengths = jax.device_get(
                    (result.tokens, result.lengths))
        _t_end = _time.perf_counter()
        with self._stats_lock:
            # lock_s vs wall_s: the under-DEVICE_LOCK fraction bounds what
            # cross-scene PIPELINING (overlapped host work, serialized
            # device work) can recover — bench.py prints the split
            self.stats["lock_s"] += _t_end - _t_lock
            self.stats["wall_s"] += _t_end - _t0
            self.stats["calls"] += 1
            self.stats["prefill_tokens"] += sum(
                len(t) for t in tok_lists[:B_real])
            self.stats["decode_tokens"] += int(
                sum(int(lengths[i]) for i in range(B_real)))
            if img_embeds is not None:
                # real ViT work only: B-padding dummy rows and per-row
                # zero-fill never ran through the encoder
                self.stats["image_tokens"] += (
                    sum(len(r.images) for r in requests)
                    * self.cfg.tokens_per_image)
            if blk_steps is not None:
                # speculation efficiency: decode_tokens / block_steps =
                # mean accepted tokens per sequential device step
                self.stats["block_steps"] = (
                    self.stats.get("block_steps", 0) + int(blk_steps))
        if _DEBUG:
            import sys as _sys
            import time as _time

            name = getattr(schema, "__name__", schema and "spec" or "text")
            print(f"[engine] B={B_real}/{B} T={T} max_new={max_new} "
                  f"schema={name} prefix={'y' if had_prefix else 'n'} "
                  f"out_lens={[int(lengths[i]) for i in range(B_real)]} "
                  f"wall={(_time.perf_counter() - _t0) * 1000:.0f}ms",
                  file=_sys.stderr)
        return [self.tokenizer.decode(out_tokens[i, : lengths[i]])
                for i in range(B_real)]

    def _dispatch_locked(self, requests, schema, tok_lists, host_images,
                         host_luts=None):
        """Device-side half of generate_batch (called under DEVICE_LOCK).
        Returns (device result, meta) without forcing a host transfer."""
        self.vlm.last_block_steps = None  # set by the block-decode path
        T = self._bucket(max(len(t) for t in tok_lists))
        T = -(-T // self.cfg.page_size) * self.cfg.page_size
        # bucket the batch dimension too (continuous batching coalesces
        # arbitrary request counts; unbucketed B explodes the compiled
        # program set).  Dummy rows are all-PAD prompts, dropped on return.
        B_real = len(requests)
        for bb in (1, 2, 4, 8, 16):
            if B_real <= bb:
                B = bb
                break
        else:
            B = B_real
        tok_lists = tok_lists + [[PAD_ID]] * (B - B_real)

        img_embeds = self._encode_request_images(requests, host_images)
        if img_embeds is not None and B > B_real:
            img_embeds = jnp.concatenate([
                img_embeds,
                jnp.zeros((B - B_real,) + img_embeds.shape[1:],
                          img_embeds.dtype)], axis=0)

        use_fsm = schema is not None
        fsm_trans = fsm_accept = fsm_dist = fsm_start = None
        fsm_floor = 1
        max_new = max(r.max_new_tokens for r in requests)
        if use_fsm:
            fsm_trans, fsm_accept, fsm_dist, min_len = self._get_fsm(schema)
            # per-row start states: schema rows at 1, free-text rows (and
            # B-padding dummies) at the permissive state 0 — one batch
            # serves constrained and unconstrained rows together
            fsm_start = jnp.asarray(
                [1 if r.schema is not None else 0 for r in requests]
                + [0] * (B - B_real), jnp.int32)
            # a schema's shortest accepting path bounds the decode budget
            # from below — never truncate mid-JSON
            fsm_floor = min_len + 32
            max_new = max(max_new, fsm_floor)

        # decode-length buckets keep the compiled-program set small
        for nb in (64, 128, 256, 512, 1024, 2048):
            if max_new <= nb:
                max_new = nb
                break
        else:
            max_new = 2048

        self._rng, sub = jax.random.split(self._rng)
        bias = self.json_length_bias if use_fsm else 0.0
        # per-row temperatures: coalesced batches keep each request's own
        # temperature (dummy rows decode greedily)
        temps = jnp.asarray(
            [float(r.temperature) for r in requests] + [0.0] * (B - B_real),
            jnp.float32)

        prefix = self._match_prefix(tok_lists[:B_real], img_embeds)
        if prefix is not None:
            result = self._generate_with_prefix(
                prefix, tok_lists, B, max_new, sub, temps,
                use_fsm, fsm_trans, fsm_accept, fsm_dist, bias, fsm_start)
        elif self.kv_layout == "contiguous" and self.block_decode:
            ids = self.tokenizer.pad_batch(tok_lists, pad_to=T, left=True)
            ids = ids[:, -T:]
            ft = fl = None
            if use_fsm:
                ft, fl = self._get_forced(schema)
            import numpy as _np

            W = self.spec_W
            empty = _np.full((1, host_luts[0].shape[0], 3 + W), PAD_ID,
                             _np.int32)
            empty[:, :, :2] = -1
            empty[:, :, 2] = 0
            lut = jnp.asarray(_np.concatenate(
                [_np.stack(host_luts)] + [empty] * (B - B_real))
                if B > B_real else _np.stack(host_luts))
            row_active = jnp.asarray([True] * B_real + [False] * (B - B_real))
            # t_max slack: rejected-draft bubbles consume cache slots
            # beyond T + max_new; the loop guard stops at the wall
            result = self.vlm.generate_contig_block(
                jnp.asarray(ids), img_embeds, sub, t_max=T + 2 * max_new,
                max_new_tokens=max_new, temperature=temps,
                use_fsm=use_fsm, fsm_trans=fsm_trans, fsm_accept=fsm_accept,
                fsm_dist=fsm_dist, fsm_start=fsm_start,
                forced_tok=ft, forced_len=fl, lut=lut,
                row_active=row_active, length_bias=bias, W=W)
        elif self.kv_layout == "contiguous":
            ids = self.tokenizer.pad_batch(tok_lists, pad_to=T, left=True)
            ids = ids[:, -T:]
            result = self.vlm.generate_contig(
                jnp.asarray(ids), img_embeds, sub, t_max=T + max_new,
                max_new_tokens=max_new, temperature=temps,
                use_fsm=use_fsm, fsm_trans=fsm_trans, fsm_accept=fsm_accept,
                fsm_dist=fsm_dist, fsm_start=fsm_start, length_bias=bias)
        else:
            result = self._generate_paged(
                tok_lists, T, B, max_new, img_embeds, sub, temps,
                use_fsm, fsm_trans, fsm_accept, fsm_dist, bias, fsm_floor,
                fsm_start)

        return result, (B_real, B, T, max_new, prefix is not None,
                        img_embeds)

    def _generate_paged(self, tok_lists, T, B, max_new, img_embeds, rng,
                        temperature, use_fsm, fsm_trans, fsm_accept,
                        fsm_dist, bias, fsm_floor=1, fsm_start=None):
        pages_per_seq = min(
            self.max_pages_per_seq,
            -(-(T + max_new) // self.cfg.page_size))
        total_new = pages_per_seq * self.cfg.page_size - T
        if total_new < fsm_floor:
            # the page budget can't cover the schema's shortest accepting
            # path (+margin): the FSM reachability mask in sampling.py
            # assumes the floor holds — violating it makes `allowed` go
            # all-False and emits DFA-illegal tokens.  Fall back to the
            # contiguous layout, which allocates T+max_new directly.
            ids = self.tokenizer.pad_batch(tok_lists, pad_to=T, left=True)
            return self.vlm.generate_contig(
                jnp.asarray(ids[:, -T:]), img_embeds, rng, t_max=T + max_new,
                max_new_tokens=max_new, temperature=temperature,
                use_fsm=use_fsm, fsm_trans=fsm_trans, fsm_accept=fsm_accept,
                fsm_dist=fsm_dist, fsm_start=fsm_start, length_bias=bias)
        ids = self.tokenizer.pad_batch(tok_lists, pad_to=T)[:, :T]
        max_new = max(1, min(max_new, total_new))

        page_lists: List[List[int]] = []
        try:
            for _ in range(B):
                page_lists.append(self.allocator.alloc(pages_per_seq))
            bt = np.full((B, pages_per_seq), 0, np.int32)
            for i, pl in enumerate(page_lists):
                bt[i] = pl

            cache = dec.KVCache(
                k_pages=self._k_pages, v_pages=self._v_pages,
                block_tables=jnp.asarray(bt),
                lengths=jnp.zeros((B,), jnp.int32))
            result, cache = self.vlm.generate(
                jnp.asarray(ids), img_embeds, cache, rng,
                max_new_tokens=max_new, temperature=temperature,
                use_fsm=use_fsm, fsm_trans=fsm_trans, fsm_accept=fsm_accept,
                fsm_dist=fsm_dist, fsm_start=fsm_start, length_bias=bias)
            self._k_pages = cache.k_pages
            self._v_pages = cache.v_pages
            return result
        finally:
            # release on every path: a compile/shape error must not leak
            # pages ("KV page pool exhausted" after a few failures)
            for pl in page_lists:
                self.allocator.release(pl)

    # -- prefix caching ---------------------------------------------------
    def _match_prefix(self, tok_lists, img_embeds) -> Optional[tuple]:
        """Find (or create) a cached page-aligned common prefix for this
        batch.  Returns the prefix token tuple, or None when the prefix
        path doesn't apply (images in the prefix, too short, disabled)."""
        from msc_tpu.models.tokenizer import IMG_ID

        if not self.prefix_caching or img_embeds is not None:
            return None
        if self.block_decode:
            # block-speculative decoding routes everything contiguous;
            # its step savings dominate the prefix cache's prefill reuse
            return None
        pg = self.cfg.page_size
        lcp = tok_lists[0]
        for t in tok_lists[1:]:
            n = min(len(lcp), len(t))
            i = 0
            while i < n and lcp[i] == t[i]:
                i += 1
            lcp = lcp[:i]
        # suffix must be NON-EMPTY for every row (the suffix prefill needs
        # at least one real token per row): never share a whole prompt.
        # P rounds DOWN to a 2-page grid: prefix_len is a static arg of the
        # jitted generate, so a coarse grid keeps the compiled set small
        max_share = min(len(t) - 1 for t in tok_lists)
        grid = 2 * pg
        P = (min(len(lcp), max_share) // grid) * grid
        while P >= 2 * pg:
            cand = tuple(lcp[:P])
            if IMG_ID in cand:
                P -= pg
                continue
            if cand in self._prefix_cache:
                self._touch_prefix(cand)
                return cand
            if len(tok_lists) >= 2:
                if self._create_prefix(cand):
                    return cand
            return None
        return None

    _SUFFIX_BUCKETS = (128, 256, 512, 1024, 2048)

    def _touch_prefix(self, key: tuple):
        self._prefix_lru.remove(key)
        self._prefix_lru.append(key)

    def _create_prefix(self, key: tuple) -> bool:
        """Prefill the prefix once into dedicated pages (read-only from
        then on).  Evicts least-recently-used prefixes past the budget."""
        pg = self.cfg.page_size
        n_pages = len(key) // pg
        if n_pages > self._prefix_budget:
            return False  # one entry may not swallow the whole budget
        while (sum(len(p) for p in self._prefix_cache.values()) + n_pages
               > self._prefix_budget and self._prefix_lru):
            old = self._prefix_lru.pop(0)
            self.allocator.release(self._prefix_cache.pop(old))
        try:
            pages = self.allocator.alloc(n_pages)
        except RuntimeError:
            return False
        ids = np.asarray(key, np.int32)[None, :]
        bt = np.asarray(pages, np.int32)[None, :]
        cache = dec.KVCache(
            k_pages=self._k_pages, v_pages=self._v_pages,
            block_tables=jnp.asarray(bt),
            lengths=jnp.zeros((1,), jnp.int32))
        cache = self.vlm.prefill_pages(jnp.asarray(ids), cache)
        self._k_pages = cache.k_pages
        self._v_pages = cache.v_pages
        self._prefix_cache[key] = pages
        self._prefix_lru.append(key)
        return True

    def _generate_with_prefix(self, prefix, tok_lists, B, max_new, rng,
                              temps, use_fsm, fsm_trans, fsm_accept,
                              fsm_dist, bias, fsm_start=None):
        """Suffix-only prefill over the shared prefix pages + paged decode
        (the Pallas kernel handles the per-row ragged lengths)."""
        pg = self.cfg.page_size
        P = len(prefix)
        prefix_pages = self._prefix_cache[prefix]
        suffixes = [t[P:] if len(t) > P else [PAD_ID] for t in tok_lists]
        # suffix width buckets (static shape -> compiled-program budget)
        need = -(-max(len(s) for s in suffixes) // pg) * pg
        Ts = next((b for b in self._SUFFIX_BUCKETS if need <= b),
                  self._SUFFIX_BUCKETS[-1])
        if need > Ts:  # over-long suffixes: clip heads (prefix covers them)
            suffixes = [s[-Ts:] for s in suffixes]
        ids = self.tokenizer.pad_batch(suffixes, pad_to=Ts)[:, :Ts]
        n_suf = Ts // pg
        n_dec = -(-max_new // pg) + 1
        own: List[List[int]] = []
        try:
            for _ in range(B):
                own.append(self.allocator.alloc(n_suf + n_dec))
            bt = np.empty((B, len(prefix_pages) + n_suf + n_dec), np.int32)
            for i, pl in enumerate(own):
                bt[i, : len(prefix_pages)] = prefix_pages
                bt[i, len(prefix_pages):] = pl
            cache = dec.KVCache(
                k_pages=self._k_pages, v_pages=self._v_pages,
                block_tables=jnp.asarray(bt),
                lengths=jnp.zeros((B,), jnp.int32))
            result, cache = self.vlm.generate_prefix(
                jnp.asarray(ids), cache, rng, prefix_len=P,
                max_new_tokens=max_new, temperature=temps,
                use_fsm=use_fsm, fsm_trans=fsm_trans,
                fsm_accept=fsm_accept, fsm_dist=fsm_dist,
                fsm_start=fsm_start, length_bias=bias)
            self._k_pages = cache.k_pages
            self._v_pages = cache.v_pages
            return result
        finally:
            for pl in own:
                self.allocator.release(pl)

    def _get_forced(self, schema):
        """Forced-run draft tables for block decoding, aligned with the
        SHIFTED + STATE-BUCKETED numbering `_get_fsm` serves (row 0 =
        permissive, pad rows forced_len 0).  Cached per schema."""
        key = id(schema)
        hit = self._forced_cache.get(key)
        if hit is None:
            from msc_tpu.models.block_decode import build_forced_tables

            dfa = structured.compile_schema_cached(schema, 256)
            ft, fl, _fs = build_forced_tables(
                np.asarray(dfa.trans), np.asarray(dfa.accept),
                self.tokenizer, self.spec_W)
            S_fsm = int(self._get_fsm(schema)[0].shape[0])
            ft2 = np.full((S_fsm, self.spec_W), PAD_ID, np.int32)
            fl2 = np.zeros((S_fsm,), np.int32)
            ft2[1: 1 + ft.shape[0]] = ft
            fl2[1: 1 + fl.shape[0]] = fl
            hit = (jnp.asarray(ft2), jnp.asarray(fl2))
            self._forced_cache[key] = hit
        return hit

    def _get_fsm(self, schema):
        """Schema DFA as device-resident arrays, cached (the scene-graph
        table is tens of MB — re-uploading per call dominated latency).

        With a BPE tokenizer the byte DFA is lifted onto the token
        vocabulary (structured.token_transition_table): a token is legal
        iff its whole byte path is, so constrained decoding stays exact
        while decoding ~3-4x fewer steps."""
        key = id(schema)
        hit = self._fsm_cache.get(key)
        if hit is None:
            if getattr(self.tokenizer, "is_bpe", False):
                dfa = structured.compile_schema_cached(schema, 256)
                trans = structured.token_transition_table(
                    dfa, self.tokenizer.token_bytes, self.cfg.vocab_size)
            else:
                dfa = structured.compile_schema_cached(
                    schema, self.cfg.vocab_size)
                trans = dfa.trans
            # Heterogeneous constrained batching: prepend ONE permissive
            # state (row 0: every token allowed, self-loop, accepting,
            # distance 0).  Free-text rows of a mixed batch start there
            # and decode exactly as unconstrained; schema rows start at
            # state 1.  Costs one table row — no per-row tables, no
            # union cache (the scene-graph table alone is ~300 MB).
            trans = np.asarray(trans)
            shifted = np.where(trans >= 0, trans + 1, -1).astype(np.int32)
            trans2 = np.concatenate(
                [np.zeros((1, trans.shape[1]), np.int32), shifted])
            accept2 = np.concatenate([[True], dfa.accept])
            dist2 = np.concatenate([[0], dfa.dist]).astype(np.int32)
            # bucket the STATE dimension: the decode program traces
            # fsm_trans by shape, so every distinct state count would
            # otherwise compile a fresh program (the ~45 per-question MQA
            # template automata all differ by a few states).  Padding to
            # shape buckets makes them share one compiled decode; pad
            # rows are unreachable (-1 transitions).
            S = trans2.shape[0]
            for sb in (64, 128, 256, 512, 1024, 2048, 4096, 8192):
                if S <= sb:
                    S = sb
                    break
            if S > trans2.shape[0]:
                pad = S - trans2.shape[0]
                trans2 = np.concatenate(
                    [trans2, np.full((pad, trans2.shape[1]), -1, np.int32)])
                accept2 = np.concatenate([accept2, np.zeros(pad, bool)])
                dist2 = np.concatenate(
                    [dist2, np.full(pad, 2**30, np.int32)])
            hit = (jnp.asarray(trans2), jnp.asarray(accept2),
                   jnp.asarray(dist2), int(dfa.dist[0]))
            self._fsm_cache[key] = hit
        return hit

    def _prep_request_images(self, requests: List[Request]):
        """Host-side image prep (grayscale->RGB, big-frame cv2 downscale)
        — runs OUTSIDE the device lock so it overlaps other threads'
        device time.  Returns the flat per-request image list, or None."""
        n_img = max((len(r.images) for r in requests), default=0)
        if n_img == 0:
            return None
        size = self.cfg.image_size
        flat = []
        for r in requests:
            for im in r.images:
                # device arrays pass straight through untouched (their
                # grayscale->RGB expansion is device work and happens in
                # _encode_request_images, under the device lock)
                if isinstance(im, jax.Array):
                    pass
                else:
                    if im.ndim == 2:
                        im = np.repeat(im[..., None], 3, axis=-1)
                    if im.shape[0] * im.shape[1] > 4 * size * size:
                        # big host frames resize BEFORE upload: a raw
                        # 900x1600 six-pack is ~26 MB h2d per scene,
                        # vs ~0.9 MB after host-side downscale
                        import cv2

                        im = cv2.resize(im, (size, size),
                                        interpolation=cv2.INTER_AREA)
                flat.append(im)
        return flat

    def _encode_request_images(self, requests: List[Request], flat=None):
        """One shape-grouped ViT pass over every request's images."""
        img_embeds = None
        n_img = max((len(r.images) for r in requests), default=0)
        if n_img > 0:
            tpi = self.cfg.tokens_per_image
            if flat is None:
                flat = self._prep_request_images(requests)
            # group by raw shape so each shape preprocesses as one batch
            # (shapes recur across scenes: camera frames, BEV, cluster tiles)
            # grayscale device arrays expand to RGB here, under the lock
            # (all device dispatch stays under DEVICE_LOCK — tunnel rule)
            flat = [jnp.repeat(im[..., None], 3, axis=-1)
                    if isinstance(im, jax.Array) and im.ndim == 2 else im
                    for im in flat]
            enc = [None] * len(flat)
            by_shape: Dict[tuple, List[int]] = {}
            for idx, im in enumerate(flat):
                by_shape.setdefault(tuple(im.shape), []).append(idx)
            for shape, idxs in by_shape.items():
                batch_imgs = jnp.stack([jnp.asarray(flat[i]) for i in idxs])
                group = self.vlm.preprocess_and_encode(batch_imgs)
                for pos, i in enumerate(idxs):
                    enc[i] = group[pos]
            # assemble per-row embeddings on device (no host round trip)
            rows = []
            k = 0
            for r in requests:
                parts = [enc[k + j] for j in range(len(r.images))]
                k += len(r.images)
                need = n_img * tpi - tpi * len(parts)
                if need > 0:
                    parts.append(jnp.zeros((need, self.cfg.vit_width),
                                           enc[0].dtype))
                rows.append(jnp.concatenate(parts, axis=0)
                            if parts else
                            jnp.zeros((n_img * tpi, self.cfg.vit_width)))
            img_embeds = jnp.stack(rows)
        return img_embeds
