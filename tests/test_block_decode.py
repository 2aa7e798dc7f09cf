"""Block-speculative decoding tests (models/block_decode.py): FSM
forced-run fast-forward + prompt-lookup drafts.

Exactness contracts tested here:
* greedy free-text block decoding is token-identical to sequential
  greedy decoding (speculative acceptance = masked-argmax match);
* constrained block decoding emits DFA-ACCEPTED text (the forced spans
  ride the canonical segmentation, so token streams may differ from the
  sequential path while the TEXT stays schema-valid);
* the host-side draft tables (prompt bigram LUT, forced-run tables) are
  consistent with the DFA/tokenizer they are built from.
"""

import json

import numpy as np
import pytest
from pydantic import BaseModel

from msc_tpu.models.block_decode import (
    LUT_SLOTS, _bigram_hash, build_forced_tables, build_prompt_lut,
)
from msc_tpu.models.tokenizer import PAD_ID
from msc_tpu.serving import structured
from msc_tpu.serving.engine import InferenceEngine, Request

from tests.test_models import TINY


class Tiny(BaseModel):
    title: str
    count: int


def _mk_engine(monkeypatch, block: bool, **kw) -> InferenceEngine:
    monkeypatch.setenv("MSC_BLOCK_DECODE", "1" if block else "0")
    return InferenceEngine(TINY, seed=0, num_pages=64, max_pages_per_seq=32,
                           kv_layout="contiguous", **kw)


def test_block_greedy_free_text_token_identical(monkeypatch):
    msgs = [{"role": "user",
             "content": "the quick brown fox jumps over the lazy dog. "
                        "the quick brown fox jumps over the lazy dog."}]
    reqs = [Request(messages=[dict(m) for m in msgs], max_new_tokens=32)]
    plain = _mk_engine(monkeypatch, block=False)
    out_p = plain.generate_batch([Request(messages=[dict(m) for m in msgs],
                                          max_new_tokens=32)])[0]
    blk = _mk_engine(monkeypatch, block=True)
    out_b = blk.generate_batch(reqs)[0]
    assert out_b == out_p


def test_block_constrained_is_dfa_valid(monkeypatch):
    reqs = [Request(messages=[{"role": "user", "content": "make a json"}],
                    schema=Tiny, max_new_tokens=96)]
    blk = _mk_engine(monkeypatch, block=True)
    out = blk.generate_batch(reqs)[0]
    dfa = structured.compile_schema(Tiny)
    s = 0
    for b in out.encode():
        s = int(dfa.trans[s, b])
        assert s >= 0, f"DFA-invalid output: {out!r}"
    assert dfa.accept[s]
    obj = json.loads(out)
    assert set(obj) == {"title", "count"}


def test_block_mixed_batch_free_and_schema(monkeypatch):
    reqs = [
        Request(messages=[{"role": "user", "content": "make a json"}],
                schema=Tiny, max_new_tokens=96),
        Request(messages=[{"role": "user", "content": "say something"}],
                max_new_tokens=96),
        Request(messages=[{"role": "user", "content": "more prose here"}],
                max_new_tokens=96),
    ]
    blk = _mk_engine(monkeypatch, block=True)
    outs = blk.generate_batch(reqs)
    assert len(outs) == 3
    json.loads(outs[0])


def test_block_template_skeleton(monkeypatch):
    from msc_tpu.agents.caption import mqa_response_format

    q = "How many <obj>cars</obj> are in the scene?"
    rf = mqa_response_format(q)
    assert rf is not None
    reqs = [Request(messages=[{"role": "user", "content": q}],
                    schema=rf, max_new_tokens=64)]
    blk = _mk_engine(monkeypatch, block=True)
    out = blk.generate_batch(reqs)[0]
    import re

    assert re.fullmatch(
        r"There are <target><cnt>\d{1,3}</cnt> <obj>cars</obj></target>\.",
        out), out


def test_build_prompt_lut_roundtrip():
    ids = [300, 301, 302, 303, 304, 300, 301, 302, 303, 304]
    W = 4
    lut = build_prompt_lut(ids, W, n_slots=64)
    h = int(_bigram_hash(np.asarray([300]), np.asarray([301]), 64)[0])
    assert lut[h, 0] == 300 and lut[h, 1] == 301
    n = lut[h, 2]
    assert n >= 2
    assert list(lut[h, 3: 3 + n]) == [302, 303, 304][: n]


def test_build_prompt_lut_truncates_at_special():
    from msc_tpu.models.tokenizer import IMG_ID

    ids = [300, 301, 302, IMG_ID, 304]
    lut = build_prompt_lut(ids, 4, n_slots=64)
    h = int(_bigram_hash(np.asarray([300]), np.asarray([301]), 64)[0])
    assert lut[h, 2] == 1  # draft stops before IMG
    assert lut[h, 3] == 302


def test_forced_tables_match_template_literal():
    from msc_tpu.models.bpe import make_tokenizer

    tok = make_tokenizer(TINY)
    spec = {"type": "template", "parts": [
        {"lit": "Hello <tag>"},
        {"type": "count", "maxDigits": 2},
        {"lit": "</tag>."},
    ]}
    dfa = structured.compile_schema(spec, 256)
    ft, fl, fs = build_forced_tables(np.asarray(dfa.trans),
                                     np.asarray(dfa.accept), tok, W=7)
    # from the start state the forced run must spell a prefix of the
    # leading literal (W byte-tokens with the byte tokenizer)
    run = bytes(int(t) for t in ft[0, : fl[0]])
    assert run == b"Hello <tag>"[: fl[0]]
    assert fl[0] > 0
    # end state transitions must continue the literal
    s = int(fs[0])
    rest = b"Hello <tag>"[fl[0]:]
    for b in rest:
        s = int(dfa.trans[s, b])
        assert s >= 0


def test_block_batch_padding_rows_terminate(monkeypatch):
    # 3 real rows pad to B=4; the dummy row must not hold the loop open
    reqs = [Request(messages=[{"role": "user", "content": f"row {i}"}],
                    max_new_tokens=16) for i in range(3)]
    blk = _mk_engine(monkeypatch, block=True)
    outs = blk.generate_batch(reqs)
    assert len(outs) == 3
