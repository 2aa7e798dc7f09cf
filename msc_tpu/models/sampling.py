"""Token sampling: greedy / temperature, with optional DFA constraints.

Constrained decoding (SURVEY.md hard part #1): the serving layer compiles
a JSON schema into a byte-level DFA (`msc_tpu/serving/structured.py`);
here the DFA's transition table masks the logits each step so the model can
only emit schema-valid bytes — the TPU-native equivalent of the
reference's `chat.completions.parse(response_format=...)`
(`src/agents/base_agent.py:27-34`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class FSM(NamedTuple):
    """Byte-level DFA over the token vocabulary.

    trans: (S, V) int32 — next state, or -1 if the byte is not allowed.
    accept: (S,) bool — states where the JSON document is complete
            (EOS becomes legal).
    dist: (S,) int32 — shortest byte distance from each state to an
            accepting state (length prior; see structured.DFA).
    """

    trans: jax.Array
    accept: jax.Array
    dist: jax.Array


def masked_logits(logits: jax.Array, fsm: Optional[FSM],
                  fsm_state: Optional[jax.Array], eos_id: int,
                  length_bias: float = 0.0,
                  remaining: Optional[jax.Array] = None) -> jax.Array:
    """The DFA/length-prior logit masking `sample_token` applies, factored
    out so speculative verification (models/block_decode.py) scores draft
    tokens under EXACTLY the serving distribution.

    ``remaining`` may be a scalar or a per-row (B,) vector (block decoding
    consumes the budget at per-row rates)."""
    if fsm is None:
        return logits
    row = fsm.trans[fsm_state]                     # (B, V)
    allowed = row >= 0
    allowed = allowed.at[:, eos_id].set(
        allowed[:, eos_id] | fsm.accept[fsm_state])
    if length_bias > 0.0 or remaining is not None:
        nxt_dist = fsm.dist[jnp.maximum(row, 0)].astype(jnp.float32)
        # EOS from an accept state is distance 0
        nxt_dist = nxt_dist.at[:, eos_id].set(0.0)
        if length_bias > 0.0:
            logits = logits - length_bias * nxt_dist
        if remaining is not None:
            rem = jnp.asarray(remaining, jnp.float32)
            if rem.ndim == 1:
                rem = rem[:, None]
            allowed = allowed & (nxt_dist <= rem)
    return jnp.where(allowed, logits, -jnp.inf)


def sample_token(logits: jax.Array, temperature, rng: jax.Array,
                 fsm: Optional[FSM], fsm_state: Optional[jax.Array],
                 eos_id: int, length_bias: float = 0.0,
                 remaining: Optional[jax.Array] = None):
    """Sample next tokens (B,) from logits (B, V), applying DFA masks.

    ``temperature`` is a (B,) array (or scalar) so heterogeneous batches
    keep each request's own temperature — the batching layers coalesce
    calls from different agents (0.2/0.3/0.7) into one device program.
    Rows with temperature <= 0 decode greedily.

    ``length_bias`` > 0 adds -length_bias * dist(next_state) to each
    allowed token's logit — a shortest-valid-completion prior that keeps
    constrained decodes terse (essential for un/under-trained models;
    set 0 for a trained model's natural distribution).

    ``remaining``: scalar int32 — decode steps left AFTER this one.  When
    given with an FSM, tokens whose successor state cannot reach an
    accepting state within ``remaining`` steps are masked out, so a
    constrained decode ALWAYS yields complete JSON inside its budget
    instead of truncating mid-document (``dist`` is a byte distance; with
    byte-fallback BPE every single byte is a token, so a path of d bytes
    is decodable in <= d token steps — the bound is conservative, never
    wrong).  The mask can't go empty: along a shortest accepting path
    dist decreases by 1 per byte, so inductively some token stays legal
    as long as the engine's budget covers dist(start) (it enforces
    ``max_new >= min_len + 32``).

    Returns (tokens, next_fsm_state).
    """
    logits = masked_logits(logits, fsm, fsm_state, eos_id,
                           length_bias=length_bias, remaining=remaining)

    temps = jnp.asarray(temperature, jnp.float32)
    if temps.ndim == 0:
        temps = jnp.broadcast_to(temps, (logits.shape[0],))
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    sampled = jax.random.categorical(
        rng, logits / jnp.maximum(temps, 1e-6)[:, None]).astype(jnp.int32)
    tokens = jnp.where(temps <= 0.0, greedy, sampled)

    if fsm is not None:
        nxt = jnp.take_along_axis(fsm.trans[fsm_state], tokens[:, None], 1)[:, 0]
        next_state = jnp.where(tokens == eos_id, fsm_state, jnp.maximum(nxt, 0))
        return tokens, next_state
    return tokens, fsm_state
