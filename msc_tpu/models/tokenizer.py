"""Byte-level tokenizer for the on-TPU VLM.

Vocabulary = 256 raw bytes + special tokens, padded to a fixed power-of-two
vocab (config.VLMConfig.vocab_size).  A byte-level vocab keeps the
JSON-schema constrained decoder exact: the schema DFA is built over bytes,
and tokens ARE bytes, so no token/character alignment problems exist
(SURVEY.md hard part #1).  No downloaded vocabularies — the framework is
hermetic.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np

PAD_ID = 256
BOS_ID = 257
EOS_ID = 258
IMG_ID = 259      # placeholder id marking image-token positions
SYSTEM_ID = 260   # role separators for the chat template
USER_ID = 261
ASSISTANT_ID = 262

N_SPECIAL = 7
BASE_VOCAB = 256 + N_SPECIAL


class ByteTokenizer:
    """UTF-8 byte tokenizer with chat-template helpers."""

    def __init__(self, vocab_size: int = 512):
        assert vocab_size >= BASE_VOCAB
        self.vocab_size = vocab_size
        self.pad_id = PAD_ID
        self.bos_id = BOS_ID
        self.eos_id = EOS_ID
        self.img_id = IMG_ID

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Iterable[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    def apply_chat_template(self, messages: List[dict],
                            num_image_tokens: int = 0) -> List[int]:
        """Render an OpenAI-style message list into token ids.

        Image parts become runs of IMG_ID placeholders that the VLM
        replaces with projected ViT embeddings at prefill.
        """
        ids: List[int] = [BOS_ID]
        role_tok = {"system": SYSTEM_ID, "user": USER_ID, "assistant": ASSISTANT_ID}
        for msg in messages:
            ids.append(role_tok.get(msg.get("role", "user"), USER_ID))
            content = msg.get("content", "")
            if isinstance(content, str):
                ids.extend(self.encode(content))
            else:  # list of parts: {"type": "text"|"image"|"image_url", ...}
                for part in content:
                    ptype = part.get("type")
                    if ptype == "text":
                        ids.extend(self.encode(part.get("text", "")))
                    elif ptype in ("image", "image_url"):
                        ids.extend([IMG_ID] * num_image_tokens)
        ids.append(ASSISTANT_ID)
        return ids

    @staticmethod
    def truncate_head_tail(ids: List[int], limit: int,
                           img_id: int | None = None) -> List[int]:
        """Shared prompt truncation (serving AND training must agree or
        the model trains on prompts it never sees at serve time): keep the
        first quarter (system framing) + the most recent remainder.

        When ``img_id`` is given, truncation is image-aware: IMG
        placeholder runs are atomic (a cut through a run would silently
        shift every later image onto the wrong ViT embedding — the k-th
        surviving placeholder consumes the k-th embedding row).  All runs
        are kept and only the text between them is head/tail-truncated;
        if the images alone exceed the budget, whole TRAILING images are
        dropped (prefix order keeps the placeholder->embedding mapping
        exact; the engine's extra embedding rows are simply unused).
        """
        if len(ids) <= limit:
            return ids
        if img_id is None or img_id not in ids:
            head = ids[: limit // 4]
            return head + ids[-(limit - len(head)):]

        # split into alternating text spans and atomic IMG runs
        segs: List[tuple] = []  # (is_img, list)
        i = 0
        n = len(ids)
        while i < n:
            j = i
            is_img = ids[i] == img_id
            while j < n and (ids[j] == img_id) == is_img:
                j += 1
            segs.append((is_img, ids[i:j]))
            i = j

        img_total = sum(len(s) for im, s in segs if im)
        min_text = 64  # never squeeze the text below this
        while img_total > limit - min_text:
            # drop the LAST image run entirely
            for k in range(len(segs) - 1, -1, -1):
                if segs[k][0]:
                    img_total -= len(segs[k][1])
                    del segs[k]
                    break
            else:
                break

        text_budget = limit - img_total
        text = [s for im, s in segs if not im]
        text_total = sum(len(s) for s in text)
        if text_total <= text_budget:
            return [t for _, s in segs for t in s]

        # head/tail over the concatenated text, then re-splice around the
        # (kept) image runs: walk segments, spending from a head budget
        # first and a tail budget at the end
        head_keep = text_budget // 4
        tail_keep = text_budget - head_keep
        # positions of text tokens in concatenated-text coordinates
        out: List[int] = []
        seen = 0
        for im, s in segs:
            if im:
                out.extend(s)
                continue
            for t in s:
                if seen < head_keep or seen >= text_total - tail_keep:
                    out.append(t)
                seen += 1
        return out

    def pad_batch(self, seqs: List[List[int]], pad_to: int | None = None,
                  left: bool = False) -> np.ndarray:
        """Pad a ragged batch.  ``left=True`` pads at the front (the
        contiguous-KV decode layout; exact under RoPE since positions are
        relative)."""
        max_len = max(len(s) for s in seqs)
        if pad_to is not None:
            max_len = max(max_len, pad_to)
        out = np.full((len(seqs), max_len), PAD_ID, dtype=np.int32)
        for i, s in enumerate(seqs):
            if left:
                out[i, max_len - len(s):] = s
            else:
                out[i, : len(s)] = s
        return out
