"""JSON-schema -> byte-level DFA compiler for constrained decoding.

TPU-native equivalent of the reference's
`chat.completions.parse(response_format=PydanticModel)`
(`src/agents/base_agent.py:27-34`): the schema compiles into a DFA over
UTF-8 bytes; since the VLM tokenizer is byte-level
(`msc_tpu/models/tokenizer.py`), the DFA transition table directly masks
token logits during decode — the model can only ever emit schema-valid
JSON (compact form, fields in schema order, all fields required).

Supported schema subset (covers every reference schema:
StructuredCaption `src/agents/structure_caption/caption_agent.py:7-44`,
HierarchicalSceneGraph `src/agents/content_transform/scenegraph_agent.py:18-120`,
SuggestionResponse, RefinedFeaturesResponse):

    {"type": "object", "properties": {...}}   (ordered, all required)
    {"type": "string"} / {"type": "integer"} / {"type": "number"}
    {"type": "boolean"} / {"type": "null"}
    {"type": "array", "items": <spec>}
    {"enum": ["lit1", "lit2", ...]}           (string literals)

Pydantic model classes are accepted directly (converted via
``model_json_schema`` with $ref resolution).

Beyond JSON, the compiler also builds RAW-TEXT TEMPLATE automata
(constrained decoding over a fixed answer template with free slots) —
the MQA answer contract is a rigid tag template where only the number /
direction / coordinate slots carry information, so constraining the
decode to the template eliminates the format-and-echo failure class
outright (r13 held-out decomposition: 63/360 failures had the RIGHT
count but a wrong object echo or malformed tags; see
agents/caption.py mqa_response_format):

    {"type": "template", "parts": [{"lit": str} | <spec>, ...]}
    {"type": "oneof", "options": [<spec>, ...]}      (branch union)
    {"type": "choice", "values": ["front", ...]}     (raw literal trie)
    {"type": "count", "maxDigits": n, "min1": bool}  (unsigned int)
    {"type": "decimal1", "maxDigits": n, "signed": b} (%.1f number)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# String-value alphabet: printable ASCII minus '"' and '\'.  '"'/'\'
# enter through a JSON escape sub-automaton (\" \\ \/ \b \f \n \r \t) —
# `chat.completions.parse` can emit any JSON string
# (`src/agents/base_agent.py:27-34`), so captions containing quotes must
# round-trip through constrained decoding too.
_STRING_BYTES = [b for b in range(32, 127) if b not in (34, 92)]
_ESCAPE_BYTES = [ord(c) for c in '"\\/bfnrt']
_DIGITS = [ord(c) for c in "0123456789"]


class DFA:
    """Immutable compiled DFA."""

    def __init__(self, trans: np.ndarray, accept: np.ndarray):
        self.trans = trans      # (S, vocab) int32, -1 = invalid
        self.accept = accept    # (S,) bool
        self.dist = _distance_to_accept(trans, accept)  # (S,) int32

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]


def _distance_to_accept(trans: np.ndarray, accept: np.ndarray) -> np.ndarray:
    """Per-state shortest byte distance to an accepting state (reverse
    BFS).  Used as a length prior during constrained decoding: biasing
    logits by -alpha*dist steers an (e.g. untrained) model toward the
    shortest schema-valid completion; alpha=0 recovers the pure model
    distribution."""
    S = trans.shape[0]
    INF = np.int32(1 << 20)
    dist = np.full((S,), INF, np.int32)
    dist[accept] = 0
    # reverse adjacency: for BFS frontier expansion
    from collections import defaultdict, deque

    rev = defaultdict(list)
    src, _ = np.nonzero(trans >= 0)
    dst = trans[trans >= 0]
    for s, t in zip(src.tolist(), dst.tolist()):
        rev[t].append(s)
    q = deque(int(i) for i in np.flatnonzero(accept))
    while q:
        t = q.popleft()
        for s in rev.get(t, ()):
            if dist[s] > dist[t] + 1:
                dist[s] = dist[t] + 1
                q.append(s)
    return dist


class _Builder:
    def __init__(self):
        self.rows: List[Dict[int, int]] = [{}]

    def new_state(self) -> int:
        self.rows.append({})
        return len(self.rows) - 1

    def add(self, s: int, byte: int, t: int):
        existing = self.rows[s].get(byte)
        if existing is not None and existing != t:
            raise ValueError(
                f"DFA conflict at state {s} on byte {byte!r} "
                f"({existing} vs {t}) — schema is ambiguous")
        self.rows[s][byte] = t

    def literal(self, entries: List[int], text: str) -> List[int]:
        """Append a literal string after every entry state; returns the
        single exit state."""
        data = text.encode("utf-8")
        cur = entries
        for b in data:
            nxt = self.new_state()
            for s in cur:
                self.add(s, b, nxt)
            cur = [nxt]
        return cur

    # -- value automata: each takes entry states, returns exit states ----
    def compile_value(self, spec, entries: List[int]) -> List[int]:
        if isinstance(spec, type):  # pydantic model class
            spec = pydantic_to_spec(spec)
        if "enum" in spec:
            return self._enum(spec["enum"], entries)
        if "lit" in spec:  # bare literal (template part / oneof branch)
            return self.literal(entries, spec["lit"])
        t = spec.get("type")
        if t == "template":
            cur = entries
            for part in spec["parts"]:
                if "lit" in part:
                    cur = self.literal(cur, part["lit"])
                else:
                    cur = self.compile_value(part, cur)
            return cur
        if t == "oneof":
            # branch union: options must diverge within their first byte
            # relative to each other (the builder's add() raises on
            # ambiguity) — factor shared prefixes into the surrounding
            # template's literals
            exits: List[int] = []
            for opt in spec["options"]:
                exits.extend(self.compile_value(opt, entries))
            return exits
        if t == "choice":
            return self._choice(spec["values"], entries)
        if t == "count":
            return self._count(entries,
                               max_digits=int(spec.get("maxDigits", 3)),
                               min1=bool(spec.get("min1", False)))
        if t == "decimal1":
            return self._decimal1(entries,
                                  max_int_digits=int(
                                      spec.get("maxDigits", 3)),
                                  signed=bool(spec.get("signed", False)))
        if t == "object":
            return self._object(spec, entries)
        if t == "array":
            return self._array(spec, entries,
                               max_items=int(spec.get("maxItems", 6)))
        if t == "string":
            return self._string(entries,
                                max_len=int(spec.get("maxLength", 48)))
        if t == "integer":
            return self._number(entries, frac=False,
                                max_int_digits=int(spec.get("maxDigits", 7)))
        if t == "number":
            return self._number(entries, frac=True,
                                max_int_digits=int(spec.get("maxDigits", 7)))
        if t == "boolean":
            a = self.literal(entries, "true")
            b = self.literal(entries, "false")
            return a + b
        if t == "null":
            return self.literal(entries, "null")
        raise ValueError(f"unsupported schema node: {spec}")

    def _string(self, entries: List[int],
                max_len: int = 48) -> List[int]:
        """Bounded-length string: the DFA structurally guarantees the
        closing quote arrives within ``max_len`` bytes, so constrained
        decodes always terminate in valid JSON regardless of model
        quality (critical with untrained weights).  The bound is
        per-schema-node: ``maxLength`` in the spec (or pydantic
        ``json_schema_extra``) overrides the default."""
        exit_ = self.new_state()
        cur = self.new_state()
        for s in entries:
            self.add(s, 34, cur)    # opening quote
        self.add(cur, 34, exit_)    # close allowed at every length 0..max
        for _ in range(max_len):
            nxt = self.new_state()
            for b in _STRING_BYTES:
                self.add(cur, b, nxt)
            # JSON escape pair (\" \\ ...) consumes one chain position:
            # maxLength bounds logical characters, not source bytes
            esc = self.new_state()
            self.add(cur, 92, esc)
            for b in _ESCAPE_BYTES:
                self.add(esc, b, nxt)
            self.add(nxt, 34, exit_)
            cur = nxt
        # final chain state has no byte transitions: close is forced
        return [exit_]

    def _number(self, entries: List[int], frac: bool,
                max_int_digits: int = 7, max_frac_digits: int = 4) -> List[int]:
        """Bounded-length number (same termination guarantee as _string)."""
        after_sign = self.new_state()
        for s in entries:
            self.add(s, ord("-"), after_sign)
        # JSON int grammar: "0" | [1-9][0-9]*  (no leading zeros)
        zero = self.new_state()
        for s in entries:
            self.add(s, ord("0"), zero)
        self.add(after_sign, ord("0"), zero)
        exits: List[int] = [zero]
        cur = None
        for i in range(max_int_digits):
            nxt = self.new_state()
            digits = _DIGITS[1:] if i == 0 else _DIGITS
            for d in digits:
                if i == 0:
                    for s in entries:
                        self.add(s, d, nxt)
                    self.add(after_sign, d, nxt)
                else:
                    self.add(cur, d, nxt)
            exits.append(nxt)
            cur = nxt
        int_exits = list(exits)
        if frac:
            frac_start = self.new_state()
            for e in int_exits:
                self.add(e, ord("."), frac_start)
            fcur = frac_start
            for j in range(max_frac_digits):
                fnxt = self.new_state()
                for d in _DIGITS:
                    self.add(fcur, d, fnxt)
                exits.append(fnxt)
                fcur = fnxt
        return exits

    def _count(self, entries: List[int], max_digits: int = 3,
               min1: bool = False) -> List[int]:
        """Unsigned decimal count: "0" | [1-9][0-9]* (no sign, no leading
        zeros — the grammar of every <cnt> slot).  min1 drops the lone
        zero (the yes-branch of an existence answer must count >=1)."""
        exits: List[int] = []
        if not min1:
            zero = self.new_state()
            for s in entries:
                self.add(s, ord("0"), zero)
            exits.append(zero)
        cur = None
        for i in range(max_digits):
            nxt = self.new_state()
            for d in (_DIGITS[1:] if i == 0 else _DIGITS):
                if i == 0:
                    for s in entries:
                        self.add(s, d, nxt)
                else:
                    self.add(cur, d, nxt)
            exits.append(nxt)
            cur = nxt
        return exits

    def _decimal1(self, entries: List[int], max_int_digits: int = 3,
                  signed: bool = False) -> List[int]:
        """Python ``%.1f`` output: optional '-', count-grammar integer
        part, '.', exactly ONE fractional digit — the byte grammar of
        the <dst>/<loc> slots the MQA generator emits."""
        starts = list(entries)
        if signed:
            after_sign = self.new_state()
            for s in entries:
                self.add(s, ord("-"), after_sign)
            starts.append(after_sign)
        int_exits = self._count(starts, max_digits=max_int_digits)
        dot = self.new_state()
        for e in int_exits:
            self.add(e, ord("."), dot)
        frac = self.new_state()
        for d in _DIGITS:
            self.add(dot, d, frac)
        return [frac]

    def _choice(self, values: List[str], entries: List[int]) -> List[int]:
        """Raw (unquoted) literal alternatives as a byte trie — unlike
        _enum there are no JSON quotes; used for free template slots
        with a closed vocabulary (camera directions).  Values that are
        prefixes of other values are fine: the shared node is both an
        exit and an interior state (the closing literal's first byte
        must not collide with any continuation byte — true for all
        '<'-delimited template slots)."""
        exits: List[int] = []
        trie: Dict[Tuple[int, ...], int] = {}
        for v in values:
            data = v.encode("utf-8")
            for i in range(1, len(data) + 1):
                prefix = tuple(data[:i])
                if prefix not in trie:
                    trie[prefix] = self.new_state()
                    if i == 1:
                        for s in entries:
                            self.add(s, data[0], trie[prefix])
                    else:
                        self.add(trie[tuple(data[:i - 1])], data[i - 1],
                                 trie[prefix])
            exits.append(trie[tuple(data)])
        return exits

    def _enum(self, values: List[str], entries: List[int]) -> List[int]:
        """Trie over quoted string literals."""
        start = self.new_state()
        for s in entries:
            self.add(s, 34, start)
        exit_ = self.new_state()
        # build a byte trie
        trie_nodes: Dict[Tuple[int, ...], int] = {(): start}
        for v in values:
            data = v.encode("utf-8")
            for i in range(1, len(data) + 1):
                prefix = tuple(data[:i])
                if prefix not in trie_nodes:
                    trie_nodes[prefix] = self.new_state()
                    self.add(trie_nodes[tuple(data[:i - 1])], data[i - 1],
                             trie_nodes[prefix])
            self.add(trie_nodes[tuple(data)], 34, exit_)
        return [exit_]

    def _object(self, spec, entries: List[int]) -> List[int]:
        props = spec["properties"]
        cur = self.literal(entries, "{")
        first = True
        for key, sub in props.items():
            sep = '"' if first else ',"'
            cur = self.literal(cur, f'{sep}{key}":')
            cur = self.compile_value(sub, cur)
            first = False
        return self.literal(cur, "}")

    def _array(self, spec, entries: List[int],
               max_items: int = 6) -> List[int]:
        """Bounded array: the item automaton is unrolled ``max_items``
        times (termination guarantee, same rationale as _string).  The
        bound is per-schema-node via ``maxItems`` — e.g.
        StructuredCaption.objects raises it to 32 so real scenes' 23-69
        annotations are representable (the reference's parse path is
        unbounded, `src/agents/structure_caption/caption_agent.py:37-44`)."""
        open_ = self.new_state()
        for s in entries:
            self.add(s, ord("["), open_)
        close = self.new_state()
        self.add(open_, ord("]"), close)  # empty array
        entry_states = [open_]
        for i in range(max_items):
            ient = self.new_state()
            exits = self.compile_value(spec["items"], [ient])
            # splice the item's entry row into this repetition's entries
            for es in entry_states:
                for b, t in self.rows[ient].items():
                    self.add(es, b, t)
            for x in exits:
                self.add(x, ord("]"), close)
            if i < max_items - 1:
                sep = self.new_state()
                for x in exits:
                    self.add(x, ord(","), sep)
                entry_states = [sep]
        return [close]


def pydantic_to_spec(model) -> dict:
    """Convert a pydantic BaseModel class to the spec subset, resolving
    $refs and enforcing schema field order."""
    raw = model.model_json_schema()
    defs = raw.get("$defs", {})

    _BOUND_KEYS = ("maxItems", "maxLength", "maxDigits")

    def bounds(node, out):
        # size bounds ride through (pydantic Field(json_schema_extra=...)
        # or native maxLength/maxItems constraints) — they parameterize
        # the DFA's unroll counts per schema node
        for k in _BOUND_KEYS:
            if k in node:
                out[k] = node[k]
        return out

    def resolve(node):
        if "$ref" in node:
            name = node["$ref"].split("/")[-1]
            return bounds(node, resolve(defs[name]))
        if "allOf" in node and len(node["allOf"]) == 1:
            return bounds(node, resolve(node["allOf"][0]))
        if "anyOf" in node:
            # Optional[...] -> take the non-null branch
            branches = [b for b in node["anyOf"] if b.get("type") != "null"]
            if len(branches) == 1:
                return bounds(node, resolve(branches[0]))
            raise ValueError("unsupported anyOf in schema")
        t = node.get("type")
        if t == "object":
            return {"type": "object", "properties": {
                k: resolve(v) for k, v in node.get("properties", {}).items()}}
        if t == "array":
            return bounds(node, {"type": "array",
                                 "items": resolve(node["items"])})
        if "enum" in node:
            return {"enum": list(node["enum"])}
        return bounds(node, {"type": t})

    return resolve(raw)


def compile_schema(schema, vocab_size: int = 512,
                   eos_id: int = 258) -> DFA:
    """Compile a schema (spec dict or pydantic class) into a DFA."""
    b = _Builder()
    exits = b.compile_value(schema, [0])
    n = len(b.rows)
    trans = np.full((n, vocab_size), -1, np.int32)
    for s, row in enumerate(b.rows):
        for byte, t in row.items():
            trans[s, byte] = t
    accept = np.zeros((n,), bool)
    for x in exits:
        accept[x] = True
    return DFA(trans, accept)


def token_transition_table(dfa: DFA, token_bytes, vocab_size: int) -> np.ndarray:
    """Lift a byte-level DFA onto a BPE vocabulary.

    Returns (S, vocab) int32: entry [s, t] is the state reached by feeding
    token t's full byte string from state s, or -1 if any byte on the path
    is invalid.  Because ids 0..255 remain raw bytes in the BPE vocab
    (byte fallback), every byte-DFA-accepted string stays reachable —
    constrained decoding is exact regardless of merge coverage.

    Vectorized per token over all states (numpy gathers); cost is
    O(S * vocab * avg_token_len), a few seconds for the largest schema,
    and cached per (schema, tokenizer) by the engine.
    """
    S = dfa.trans.shape[0]
    out = np.full((S, vocab_size), -1, np.int32)
    # single-byte tokens are direct column copies
    out[:, :256] = dfa.trans[:, :256]
    states0 = np.arange(S, dtype=np.int32)
    for tid in range(256, min(len(token_bytes), vocab_size)):
        tb = token_bytes[tid]
        if not tb:
            continue  # special tokens: never legal inside JSON
        cur = dfa.trans[states0, tb[0]]
        for b in tb[1:]:
            safe = np.maximum(cur, 0)
            cur = np.where(cur >= 0, dfa.trans[safe, b], -1)
        out[:, tid] = cur
    return out


_CACHE: Dict[tuple, DFA] = {}


def compile_schema_cached(schema, vocab_size: int = 512) -> DFA:
    key = (id(schema), vocab_size) if isinstance(schema, type) else None
    if key is not None and key in _CACHE:
        return _CACHE[key]
    dfa = compile_schema(schema, vocab_size)
    if key is not None:
        _CACHE[key] = dfa
    return dfa
