"""Byte-pair-encoding tokenizer with exact byte fallback.

Round-1 used a pure byte-level tokenizer (`msc_tpu/models/tokenizer.py`):
exact for DFA-constrained decoding but ~4x token-inefficient for prose,
which made the effective context window tiny next to the reference's 128k
Azure window (`src/agents/base_agent.py:21-34` sends full Layer-1 JSON +
whole captions per call) and made every decode 4x longer than it needed
to be.

``BPETokenizer`` keeps the exactness and fixes the efficiency:

  * ids 0..255 are raw bytes (the fallback: every byte string stays
    representable, so nothing is ever OOV);
  * ids 256..262 are the special tokens (same assignments as the byte
    tokenizer);
  * ids 263.. are learned BPE merges.

Constrained decoding stays exact by construction: the schema DFA is
compiled over bytes as before, then lifted to the token vocabulary by
composing each token's byte path through the byte table
(`structured.token_transition_table`) — a token is legal in state ``s``
iff its full byte string is, and its transition lands where the bytes
land.  The byte-fallback ids guarantee every DFA-accepted string remains
reachable even where no merged token fits.

The vocabulary is trained hermetically on framework-generated text (agent
prompts, analytic-pipeline captions/observations, MQA questions/answers)
— no downloaded files:

    python -m msc_tpu.models.bpe --vocab-size 1024 \
        --out msc_tpu/models/bpe_vocab_1024.json
"""

from __future__ import annotations

import json
import re
from collections import Counter
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Tuple

from msc_tpu.models.tokenizer import (
    BASE_VOCAB,
    ByteTokenizer,
)

# GPT-2-style pre-tokenization: merges never cross these chunk boundaries,
# so tokens align with word/number/punctuation structure.
_PRETOK = re.compile(
    rb" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

_MERGE_BASE = BASE_VOCAB  # first merged-token id (263)


def pretokenize(data: bytes) -> List[bytes]:
    return _PRETOK.findall(data)


def train_bpe(corpus: bytes, vocab_size: int) -> List[Tuple[bytes, bytes]]:
    """Learn BPE merges from a byte corpus.

    Returns the ordered merge list; merged-token ids follow the order
    (id = _MERGE_BASE + index).  Classic frequency-greedy BPE over a
    unique-chunk frequency map (driving-scene text is highly repetitive,
    so the unique set is small and training is seconds).
    """
    num_merges = vocab_size - _MERGE_BASE
    if num_merges <= 0:
        return []
    words: Dict[Tuple[bytes, ...], int] = Counter()
    for chunk in pretokenize(corpus):
        words[tuple(bytes([b]) for b in chunk)] += 1

    merges: List[Tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for w, c in words.items():
            for pair in zip(w, w[1:]):
                pair_counts[pair] += c
        if not pair_counts:
            break
        best, cnt = pair_counts.most_common(1)[0]
        if cnt < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Dict[Tuple[bytes, ...], int] = {}
        for w, c in words.items():
            if best[0] not in w:
                new_words[w] = new_words.get(w, 0) + c
                continue
            out: List[bytes] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + c
        words = new_words
    return merges


class BPETokenizer(ByteTokenizer):
    """BPE with byte fallback; drop-in for ByteTokenizer.

    Chat templating, truncation, and padding are inherited — only
    encode/decode change, plus ``token_bytes`` which the constrained
    decoder uses to lift the byte DFA onto this vocabulary.
    """

    def __init__(self, merges: List[Tuple[bytes, bytes]],
                 vocab_size: Optional[int] = None):
        n = _MERGE_BASE + len(merges)
        super().__init__(max(vocab_size or n, n))
        self.merges = merges
        self.ranks: Dict[Tuple[bytes, bytes], int] = {
            m: i for i, m in enumerate(merges)}
        # token id -> byte string (specials map to b"")
        self.token_bytes: List[bytes] = (
            [bytes([i]) for i in range(256)]
            + [b""] * (_MERGE_BASE - 256)
            + [a + b for a, b in merges])
        self._token_id: Dict[bytes, int] = {
            tb: i for i, tb in enumerate(self.token_bytes) if tb}
        self._encode_chunk = lru_cache(maxsize=65536)(self._encode_chunk_raw)

    @property
    def is_bpe(self) -> bool:
        return True

    def _encode_chunk_raw(self, chunk: bytes) -> Tuple[int, ...]:
        word: List[bytes] = [bytes([b]) for b in chunk]
        while len(word) >= 2:
            best_rank = None
            best_i = -1
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            word[best_i: best_i + 2] = [word[best_i] + word[best_i + 1]]
        return tuple(self._token_id[t] for t in word)

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for chunk in pretokenize(text.encode("utf-8")):
            out.extend(self._encode_chunk(chunk))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        tb = self.token_bytes
        n = len(tb)
        data = b"".join(tb[i] for i in ids if 0 <= i < n)
        return data.decode("utf-8", errors="replace")

    # -- persistence --------------------------------------------------------
    def save(self, path: str):
        payload = {
            "vocab_size": self.vocab_size,
            "merges": [[a.decode("latin-1"), b.decode("latin-1")]
                       for a, b in self.merges],
        }
        with open(path, "w") as f:
            json.dump(payload, f)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            payload = json.load(f)
        merges = [(a.encode("latin-1"), b.encode("latin-1"))
                  for a, b in payload["merges"]]
        return cls(merges, vocab_size=payload.get("vocab_size"))


def make_tokenizer(cfg) -> ByteTokenizer:
    """Tokenizer factory from a VLMConfig (``cfg.tokenizer``: "byte" or
    "bpe"; "bpe" loads ``cfg.bpe_vocab_path`` relative to the package)."""
    kind = getattr(cfg, "tokenizer", "byte")
    if kind == "byte":
        return ByteTokenizer(cfg.vocab_size)
    if kind == "bpe":
        import os

        path = getattr(cfg, "bpe_vocab_path", "") or "bpe_vocab_1024.json"
        if not os.path.isabs(path):
            path = os.path.join(os.path.dirname(__file__), path)
        tok = BPETokenizer.load(path)
        if tok.vocab_size > cfg.vocab_size:
            raise ValueError(
                f"BPE vocab ({tok.vocab_size}) exceeds cfg.vocab_size "
                f"({cfg.vocab_size}); raise the model vocab")
        tok.vocab_size = cfg.vocab_size
        return tok
    raise ValueError(f"unknown tokenizer kind: {kind}")


# ---------------------------------------------------------------------------
# Hermetic corpus + CLI
# ---------------------------------------------------------------------------

def build_corpus(num_scenes: int = 12) -> bytes:
    """Framework-generated training text: every prompt family the serving
    path actually sees (agent system prompts, captions as compact AND
    indented JSON, observations, MQA Q/A), so merges specialize to the
    real token distribution."""
    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.analytic import AnalyticBackend, answer_mqa_from_caption

    parts: List[str] = []
    # agent prompt constants (system framing recurs in every call)
    import importlib
    import inspect

    for mod_name in ("camera", "lidar", "scenegraph", "crossmodal", "seed",
                     "suggester", "editor", "caption"):
        mod = importlib.import_module(f"msc_tpu.agents.{mod_name}")
        for name, val in inspect.getmembers(mod):
            if name.startswith("_") and isinstance(val, str) and len(val) > 40:
                parts.append(val)

    loader = MockNuScenesLoader(num_scenes=num_scenes, samples_per_scene=1)
    pipeline = SemanticCaptioningPipeline(backend=AnalyticBackend(),
                                          verbose=False)
    mqa = generate_mock_mqa(loader, num_scenes=num_scenes,
                            samples_per_scene=1)
    for i in range(num_scenes):
        sample = loader.get_sample_by_scene_index(i, 0)
        result = pipeline.process_scene(
            images=sample["images"], camera_names=sample["camera_names"],
            point_cloud=sample["point_cloud"],
            annotations=sample["annotations"])
        cap = result["structured_caption"]
        parts.append(json.dumps(cap, indent=2))
        parts.append(json.dumps(cap, separators=(",", ":")))
        for stage in result["pipeline_stages"]["layer1_content_transformation"]:
            obs = stage.get("observations", "")
            parts.append(obs if isinstance(obs, str) else json.dumps(obs))
        parts.append(result["pipeline_stages"]["layer2_seed_caption"]
                     .get("final_caption", ""))
        qs = mqa[mqa["sample_token"] == sample["sample_token"]]
        for _, row in qs.iterrows():
            msgs = build_mqa_messages(row["question"], cap)
            parts.append(msgs[1]["content"])
            parts.append(answer_mqa_from_caption(row["question"], cap))
    return "\n".join(parts).encode("utf-8")


def main():
    import argparse
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-size", type=int, default=1024)
    ap.add_argument("--scenes", type=int, default=12)
    ap.add_argument("--out", default="msc_tpu/models/bpe_vocab_1024.json")
    args = ap.parse_args()

    print(f"building corpus from {args.scenes} analytic scenes...")
    corpus = build_corpus(args.scenes)
    print(f"corpus: {len(corpus)/1e6:.2f} MB")
    t0 = time.time()
    merges = train_bpe(corpus, args.vocab_size)
    print(f"trained {len(merges)} merges in {time.time()-t0:.1f}s")
    tok = BPETokenizer(merges, vocab_size=args.vocab_size)
    ids = tok.encode(corpus[:100000].decode("utf-8", errors="replace"))
    print(f"compression: {100000/max(len(ids),1):.2f} bytes/token")
    tok.save(args.out)
    print(f"vocab -> {args.out}")


if __name__ == "__main__":
    main()
