"""Multi-token block decoding: FSM forced-run fast-forward + prompt-lookup
speculation on the contiguous serving path.

Why
---
The serving workload's decoded tokens are mostly *predictable from the
host's point of view*:

* Constrained (schema/template) outputs spend most of their tokens on
  DFA-FORCED spans — JSON keys, punctuation, template skeletons — where
  the byte DFA admits exactly one byte (measured over a full-config
  analytic pipeline pass: 1.7x fewer branch points than tokens on the
  schema'd tasks; the MQA template answers are 6.8x).
* Free-prose outputs (seed captions, merge, camera describe) are largely
  COPIES of prompt text (the distilled model's own training objective is
  fact-line/observation copying) — an n-gram lookup into the prompt
  drafts the continuation with high acceptance (measured 3.6-4.9x on the
  seed/merge family under perfect-acceptance simulation).

Both reduce to the same device schedule: per while-loop iteration, decode
a BLOCK of ``1 + W`` tokens — one sampled token plus a W-token draft —
through a single W+1-wide forward (a mini-prefill against the contiguous
KV cache), then accept a per-row prefix of the draft.  Sequential decode
steps drop by the mean accepted-run length; each block step costs barely
more than a single step because the dominant HBM terms (weight reads,
KV-cache reads) are shared across the block's positions.

Exactness
---------
* FSM-forced drafts are accepted by construction: while the byte DFA
  admits exactly one byte, the emitted TEXT is independent of the model.
  The forced run is fed in the tokenizer's canonical segmentation (the
  same segmentation training targets use), so the model's conditioning
  at the next branch point stays in-distribution.
* Prompt-lookup drafts are verified with standard speculative-sampling
  acceptance: draft token d at a position with (masked) model
  distribution p is accepted with probability p(d); on rejection the
  next iteration's sample EXCLUDES d (the exact residual for a
  point-mass draft distribution).  Greedy rows (temperature <= 0) accept
  iff d is the masked argmax — block decoding is then *token-identical*
  to sequential greedy decoding (tested).

KV-cache layout: bubbles
------------------------
Rows accept different draft lengths per iteration, so cache-slot indices
and token positions decouple: every row writes its block at the same
slot window ``[write_pos, write_pos + 1 + W)`` (one in-place
dynamic-update-slice — the contiguous layout's whole point), the write
cursor advances by the batch MAX accepted count, and shorter rows leave
invalid "bubble" slots that the attention mask skips.  RoPE stays exact
because keys/queries are rotated by per-row REAL positions (cumulative
accepted tokens), not slot indices.  Bubble inflation is bounded by the
per-iteration batch skew; ``t_max`` slack is guarded by the loop
condition (a row nearing the wall simply stops accepting drafts).

The reference has no counterpart (its decoding happens inside Azure,
`src/agents/base_agent.py:21-34`); this is TPU-native serving work in
the spirit of BASELINE.json's >= 2 scenes/sec/chip north star.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msc_tpu.config import VLMConfig
from msc_tpu.models import decoder as dec
from msc_tpu.models.sampling import FSM, masked_logits, sample_token
from msc_tpu.models.tokenizer import EOS_ID, IMG_ID, PAD_ID

# open-addressing bigram hash parameters — host build (build_prompt_lut)
# and device lookup (_lut_lookup) MUST use the same function
LUT_SLOTS = 2048


def _bigram_hash(a, b, n_slots: int):
    """uint32 multiplicative bigram hash; identical math for numpy and
    jnp operands (n_slots must be a power of two)."""
    xp = np if isinstance(a, np.ndarray) else jnp
    ua = a.astype(xp.uint32)
    ub = b.astype(xp.uint32)
    h = ua * xp.uint32(2654435761) + ub * xp.uint32(40503)
    return (h & xp.uint32(n_slots - 1)).astype(xp.int32)


def build_prompt_lut(tok_ids, W: int, n_slots: int = LUT_SLOTS) -> np.ndarray:
    """Host-side prompt n-gram index for one request.

    Returns (n_slots, 3 + W) int32: slot = [key_a, key_b, count,
    draft_0..draft_{W-1}]; unfilled keys are -1.  For every bigram
    (t[j-1], t[j]) in the prompt the slot stores the next up-to-W tokens
    (truncated at IMG/PAD/EOS — drafts must be plain text).  Later
    occurrences overwrite earlier ones (recency wins, matching the
    "most recent match" drafting heuristic).
    """
    lut = np.full((n_slots, 3 + W), PAD_ID, np.int32)
    lut[:, :2] = -1
    lut[:, 2] = 0
    ids = np.asarray(tok_ids, np.int32)
    if len(ids) < 3:
        return lut
    special = (PAD_ID, IMG_ID, EOS_ID)
    a, b = ids[:-2], ids[1:-1]
    hs = _bigram_hash(a, b, n_slots)
    for j in range(len(ids) - 2):
        if ids[j] in special or ids[j + 1] in special:
            continue
        nxt = ids[j + 2: j + 2 + W]
        cut = np.isin(nxt, special)
        n = int(np.argmax(cut)) if cut.any() else len(nxt)
        if n == 0:
            continue
        h = hs[j]
        lut[h, 0] = ids[j]
        lut[h, 1] = ids[j + 1]
        lut[h, 2] = n
        lut[h, 3:] = PAD_ID
        lut[h, 3: 3 + n] = nxt[:n]
    return lut


def build_forced_tables(dfa_trans: np.ndarray, dfa_accept: np.ndarray,
                        tokenizer, W: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-DFA-state forced continuations, canonical token segmentation.

    For each byte-DFA state s: follow transitions while exactly ONE byte
    is legal and the state is not accepting — that byte string is forced
    (the model's choice cannot change the output text).  Encode it with
    the canonical tokenizer, keep the first W tokens, and record the
    byte-DFA state reached after them.

    Returns (forced_tok (S, W) int32 PAD-padded, forced_len (S,) int32,
    forced_state (S,) int32) in UNSHIFTED byte-DFA state numbering —
    the engine shifts by +1 to match its permissive-row-0 tables.
    """
    S = dfa_trans.shape[0]
    forced_tok = np.full((S, W), PAD_ID, np.int32)
    forced_len = np.zeros((S,), np.int32)
    forced_state = np.arange(S, dtype=np.int32)
    # byte legality per state, vectorized
    legal_counts = (dfa_trans >= 0).sum(axis=1)
    only_byte = np.argmax(dfa_trans >= 0, axis=1)
    for s in range(S):
        if dfa_accept[s] or legal_counts[s] != 1:
            continue
        run = bytearray()
        cur = s
        while (not dfa_accept[cur] and legal_counts[cur] == 1
               and len(run) < 4 * W + 16):
            b = int(only_byte[cur])
            run.append(b)
            cur = int(dfa_trans[cur, b])
        if not run:
            continue
        ids = tokenizer.encode(run.decode("latin-1"))[:W]
        # end state after the (possibly truncated) token run
        cur = s
        nb = 0
        for t in ids:
            tb = (tokenizer.token_bytes[t] if t >= 256 else bytes([t]))
            nb += len(tb)
        cur = s
        for b in run[:nb]:
            cur = int(dfa_trans[cur, b])
        forced_tok[s, : len(ids)] = ids
        forced_len[s] = len(ids)
        forced_state[s] = cur
    return forced_tok, forced_len, forced_state


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------

def decode_block_contig(params: Dict, cfg: VLMConfig, blk: jax.Array,
                        positions: jax.Array, proposed: jax.Array,
                        write_pos: jax.Array, cache: dec.ContigCache
                        ) -> Tuple[jax.Array, dec.ContigCache]:
    """One W+1-wide decode block, contiguous layout.

    blk: (B, Wb) int32 block tokens (sampled + draft, PAD-padded).
    positions: (B, Wb) int32 per-row REAL token positions (RoPE).
    proposed: (B, Wb) bool — which block entries are real proposals
        (their K/V become attendable; rejected tails are invalidated by
        the caller never advancing past them... they stay attendable
        only within this block's own causal window, and are masked out
        for all FUTURE queries via the valid-mask rewrite in the loop).
    write_pos: scalar int32 — uniform cache slot of blk[:, 0].

    Returns (logits (B, Wb, vocab) at every block position, cache').
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    B, Wb = blk.shape
    Tmax = cache.k.shape[2]

    x = params["embed"].astype(dtype)[blk]                    # (B, Wb, D)

    # attendable keys for block queries: all previously-valid slots plus
    # the block's own proposed entries, causally within the block
    valid_blk = jax.lax.dynamic_update_slice(
        cache.valid, proposed, (0, write_pos))                # (B, Tmax)

    KV, G, hd = cfg.n_kv_heads, cfg.n_heads // cfg.n_kv_heads, cfg.head_dim
    # Pallas flash path (ops/block_attention.py): the XLA formulation
    # below materializes the (B, KV, G, Wb, Tmax) fp32 score tensor —
    # ~Wb x the single-step score traffic against a step already at the
    # HBM roofline (measured ~4x/step, RESULTS.md round-5 bench A/B).
    # Opt out with MSC_FLASH_BLOCK=0; CPU keeps the XLA path (tests).
    import os as _os

    use_flash = (jax.default_backend() == "tpu"
                 and _os.environ.get("MSC_FLASH_BLOCK", "1") == "1"
                 and Tmax % 128 == 0)
    if not use_flash:
        slot = jnp.arange(Tmax)[None, None, :]                # (1,1,Tmax)
        qidx = jnp.arange(Wb)[None, :, None]                  # (1,Wb,1)
        in_block = slot - write_pos                           # offset
        mask = (valid_blk[:, None, :]
                & ((in_block < 0) | (in_block <= qidx)))
    k_cache, v_cache = cache.k, cache.v

    for li, layer in enumerate(params["layers"]):
        h = dec._rmsnorm(x, layer["ln1"])
        q, k, v = dec._proj_qkv(layer, h, dtype, cfg.n_heads, KV, hd)
        q = dec._rope(q.reshape(B, Wb, cfg.n_heads, hd), positions,
                      cfg.rope_theta)
        k = dec._rope(k.reshape(B, Wb, KV, hd), positions, cfg.rope_theta)
        v = v.reshape(B, Wb, KV, hd)

        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None].astype(k_cache.dtype), (li, 0, write_pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None].astype(v_cache.dtype), (li, 0, write_pos, 0, 0))

        if use_flash:
            from msc_tpu.ops.block_attention import flash_block_attention

            o = flash_block_attention(q, k_cache[li], v_cache[li],
                                      valid_blk, write_pos)
            o = o.reshape(B, Wb, cfg.n_heads * hd).astype(dtype)
        else:
            ks = k_cache[li].astype(dtype)                    # (B,Tmax,KV,hd)
            vs = v_cache[li].astype(dtype)
            qg = q.reshape(B, Wb, KV, G, hd)
            att = jnp.einsum("btkgd,bskd->bkgts", qg, ks,
                             preferred_element_type=jnp.float32) * hd ** -0.5
            att = jnp.where(mask[:, None, None], att, -1e30)
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bkgts,bskd->btkgd", att.astype(dtype), vs,
                           preferred_element_type=jnp.float32)
            o = o.reshape(B, Wb, cfg.n_heads * hd).astype(dtype)
        x = x + jnp.dot(o, layer["wo"].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        x = x + dec._mlp(layer, dec._rmsnorm(x, layer["ln2"]), dtype,
                         cfg.moe_top_k, packed=True)

    x = dec._rmsnorm(x, params["ln_f"])
    logits = jnp.dot(x, params["embed"].T.astype(dtype),
                     preferred_element_type=jnp.float32)
    new_cache = dec.ContigCache(k_cache, v_cache, valid_blk, cache.pos)
    return logits.astype(jnp.float32), new_cache


def generate_contig_block_impl(
        cfg: VLMConfig, params: Dict, ids: jax.Array,
        img_embeds: Optional[jax.Array], rng: jax.Array,
        temperature: jax.Array,
        fsm_trans, fsm_accept, fsm_dist, fsm_start,
        forced_tok, forced_len,
        lut: Optional[jax.Array], row_active: jax.Array,
        *, t_max: int, max_new_tokens: int, use_fsm: bool,
        length_bias: float, W: int, seq_mesh=None):
    """Block-speculative contiguous generate.  Returns (tokens, lengths).

    forced_tok/forced_len: (S, W)/(S,) in the engine's SHIFTED state
    space (row 0 = permissive free-text state, forced_len[0] == 0), or
    None when use_fsm is False.  End states are re-derived on device by
    chaining the token-lifted transition table over the draft tokens.
    lut: (B, LUT_SLOTS, 3+W) per-row prompt bigram index, or None.
    row_active: (B,) bool — False rows (batch padding) start done.
    """
    dparams = params["dec"]
    B = ids.shape[0]
    Wb = W + 1
    fsm = FSM(fsm_trans, fsm_accept, fsm_dist) if use_fsm else None

    logits, cache = dec.prefill_contig(dparams, cfg, ids, img_embeds, t_max,
                                       PAD_ID, IMG_ID, seq_mesh=seq_mesh)

    out = jnp.full((B, max_new_tokens), PAD_ID, jnp.int32)
    fsm_state = (jnp.zeros((B,), jnp.int32) if fsm_start is None
                 else jnp.asarray(fsm_start, jnp.int32))
    done = ~jnp.asarray(row_active, bool)
    n_out = jnp.zeros((B,), jnp.int32)
    real_pos = jnp.full((B,), ids.shape[1], jnp.int32)
    write_pos = jnp.int32(ids.shape[1])
    ban = jnp.full((B,), -1, jnp.int32)
    prev_tok = ids[:, -1].astype(jnp.int32)  # left-padded: last col is real

    def cond(state):
        (logits, cache, out, n_out, done, fsm_state, real_pos, write_pos,
         ban, prev_tok, rng, n_iter) = state
        room = write_pos + Wb <= t_max
        active = ~done & (n_out < max_new_tokens)
        return jnp.any(active) & room

    def body(state):
        (logits, cache, out, n_out, done, fsm_state, real_pos, write_pos,
         ban, prev_tok, rng, n_iter) = state
        rng, s_tok, s_acc = jax.random.split(rng, 3)

        # ---- 1. sample the branch token (with residual ban) ----
        lg = jnp.where(
            (jnp.arange(logits.shape[-1])[None] == ban[:, None])
            & (ban[:, None] >= 0), -jnp.inf, logits)
        remaining = jnp.maximum(max_new_tokens - n_out - 1, 0)
        t0, st0 = sample_token(
            lg, temperature, s_tok, fsm, fsm_state, EOS_ID,
            length_bias=length_bias,
            remaining=remaining if use_fsm else None)
        t0 = jnp.where(done, PAD_ID, t0)
        now_done = done | (t0 == EOS_ID)
        st0 = jnp.where(done, fsm_state, st0)

        # ---- 2. draft fetch ----
        if use_fsm:
            f_len = forced_len[st0]                            # (B,)
            f_tok = forced_tok[st0]                            # (B, W)
        else:
            f_len = jnp.zeros((B,), jnp.int32)
            f_tok = jnp.full((B, W), PAD_ID, jnp.int32)
            f_end = st0
        if lut is not None:
            h = _bigram_hash(prev_tok, t0, lut.shape[1])
            ent = lut[jnp.arange(B), h]                        # (B, 3+W)
            l_hit = (ent[:, 0] == prev_tok) & (ent[:, 1] == t0)
            l_len = jnp.where(l_hit, ent[:, 2], 0)
            l_tok = ent[:, 3:]
        else:
            l_len = jnp.zeros((B,), jnp.int32)
            l_tok = jnp.full((B, W), PAD_ID, jnp.int32)
        is_forced = f_len > 0
        d_len = jnp.where(is_forced, f_len, l_len)
        d_len = jnp.where(now_done, 0, d_len)
        # drafting past the output budget is wasted work AND would
        # overflow `out`: clip to the remaining budget
        d_len = jnp.minimum(d_len, jnp.maximum(
            max_new_tokens - n_out - 1, 0))
        d_tok = jnp.where(is_forced[:, None], f_tok, l_tok)
        kidx = jnp.arange(W)[None, :]
        d_tok = jnp.where(kidx < d_len[:, None], d_tok, PAD_ID)

        # ---- 3. block forward ----
        blk = jnp.concatenate([t0[:, None], d_tok], axis=1)   # (B, Wb)
        proposed = jnp.concatenate(
            [(~done)[:, None], kidx < d_len[:, None]], axis=1)
        positions = real_pos[:, None] + jnp.arange(Wb)[None, :]
        logits_all, cache = decode_block_contig(
            dparams, cfg, blk, positions, proposed, write_pos, cache)

        # ---- 4. verification ----
        # FSM state chain through the draft (token-level transitions)
        if use_fsm:
            states = [st0]
            s_cur = st0
            for k in range(W):
                nxt = jnp.take_along_axis(
                    fsm_trans[s_cur], d_tok[:, k][:, None], 1)[:, 0]
                # illegal transitions clamp to 0: the verifying masked
                # distribution gives that draft token probability 0, so
                # the garbage tail states are never committed
                s_cur = jnp.maximum(nxt, 0)
                states.append(s_cur)
            state_chain = jnp.stack(states, axis=1)           # (B, W+1)
        else:
            state_chain = jnp.broadcast_to(st0[:, None], (B, W + 1))

        # per-position masked distributions for the lookup-draft rows
        # (forced rows skip verification: their text is DFA-determined)
        ver_logits = logits_all[:, :W]                        # (B, W, V)
        if use_fsm:
            rem_k = jnp.maximum(
                remaining[:, None] - 1 - jnp.arange(W)[None, :], 0)
            ml = masked_logits(
                ver_logits.reshape(B * W, -1), fsm,
                state_chain[:, :W].reshape(B * W), EOS_ID,
                length_bias=length_bias,
                remaining=rem_k.reshape(B * W)).reshape(B, W, -1)
        else:
            ml = ver_logits
        temps = jnp.broadcast_to(
            jnp.asarray(temperature, jnp.float32).reshape(-1), (B,))
        probs = jax.nn.softmax(
            ml / jnp.maximum(temps, 1e-6)[:, None, None], axis=-1)
        p_d = jnp.take_along_axis(probs, d_tok[:, :, None], 2)[:, :, 0]
        argm = jnp.argmax(ml, axis=-1).astype(jnp.int32)      # (B, W)
        u = jax.random.uniform(s_acc, (B, W))
        ok_sample = jnp.where(temps[:, None] <= 0.0,
                              d_tok == argm, u < p_d)
        ok = jnp.where(is_forced[:, None], kidx < d_len[:, None],
                       ok_sample & (kidx < d_len[:, None]))
        acc_mask = jnp.cumprod(ok.astype(jnp.int32), axis=1)  # (B, W)
        n_acc = acc_mask.sum(axis=1).astype(jnp.int32)

        # residual ban: only on a SAMPLING rejection (not draft-end)
        rej_pos = jnp.clip(n_acc, 0, W - 1)
        rej_tok = jnp.take_along_axis(d_tok, rej_pos[:, None], 1)[:, 0]
        had_rej = (n_acc < d_len) & ~is_forced
        ban_next = jnp.where(had_rej, rej_tok, -1)

        # ---- 5. commit ----
        # emit t0 (unless done/EOS) + accepted draft tokens
        emit0 = ~done & (t0 != EOS_ID)
        emit = jnp.concatenate(
            [emit0[:, None], acc_mask.astype(bool)], axis=1)  # (B, Wb)
        cols = n_out[:, None] + jnp.cumsum(emit, axis=1) - 1
        cols = jnp.where(emit, cols, max_new_tokens)          # OOB -> drop
        rows = jnp.arange(B)[:, None]
        out = out.at[rows, cols].set(blk, mode="drop")
        n_emit = emit.sum(axis=1).astype(jnp.int32)
        n_out = n_out + n_emit
        now_done = now_done | (n_out >= max_new_tokens)

        adv = jnp.where(done, 0, 1 + n_acc)                   # cache slots
        real_pos = real_pos + adv
        # invalidate the rejected draft tails for all FUTURE queries:
        # committed slots for row b this iteration are
        # [write_pos, write_pos + adv_b); everything else in the block
        # window becomes a bubble the attention mask skips
        slot_off = jnp.arange(Wb)[None, :]
        keep = (slot_off < adv[:, None]) & proposed
        valid = jax.lax.dynamic_update_slice(
            cache.valid, keep, (0, write_pos))
        cache = dec.ContigCache(cache.k, cache.v, valid, cache.pos)
        write_pos = write_pos + jnp.max(adv)

        # next-iteration logits = logits after the last committed token
        nxt_logits = jnp.take_along_axis(
            logits_all, jnp.clip(n_acc, 0, W)[:, None, None], 1)[:, 0]
        nxt_logits = jnp.where(done[:, None], logits, nxt_logits)

        fsm_state = jnp.take_along_axis(
            state_chain, jnp.clip(n_acc, 0, W)[:, None], 1)[:, 0]
        fsm_state = jnp.where(now_done, st0, fsm_state)
        last_committed = jnp.take_along_axis(
            blk, n_acc[:, None], 1)[:, 0]
        prev_tok = jnp.where(now_done | done, prev_tok, last_committed)

        return (nxt_logits, cache, out, n_out, now_done, fsm_state,
                real_pos, write_pos, ban_next, prev_tok, rng, n_iter + 1)

    state = (logits, cache, out, n_out, done, fsm_state, real_pos,
             write_pos, ban, prev_tok, rng, jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    out = state[2]
    lengths = (out != PAD_ID).sum(axis=1).astype(jnp.int32)
    # speculation-efficiency telemetry: tokens-emitted / n_iter is the
    # per-call accepted-run mean (sequential decoding would be ~1.0,
    # counting the max row's EOS walk); the engine aggregates it
    return out, lengths, state[11]
