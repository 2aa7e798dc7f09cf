"""Model-layer tests: tokenizer, ViT, decoder prefill/decode-step
consistency, paged-cache generate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msc_tpu.config import VLMConfig
from msc_tpu.models.tokenizer import (
    ByteTokenizer, BOS_ID, EOS_ID, IMG_ID, PAD_ID,
)
from msc_tpu.models import decoder as dec
from msc_tpu.models import vit as vit_mod
from msc_tpu.models.vlm import VLM, init_vlm_params, make_cache_for, pad_prompt


TINY = VLMConfig(
    image_size=28, patch_size=14, vit_width=32, vit_depth=2, vit_heads=2,
    vocab_size=512, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
    head_dim=16, mlp_hidden=128, max_seq_len=256, page_size=16,
    dtype="float32", tokenizer="byte",
)


@pytest.fixture(scope="module")
def tiny_vlm():
    params = init_vlm_params(jax.random.PRNGKey(0), TINY)
    return VLM(TINY, params)


def test_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = 'Hello {"json": 1.5} — unicode ✓'
    assert tok.decode(tok.encode(s)) == s


def test_chat_template_images():
    tok = ByteTokenizer()
    messages = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": [
            {"type": "text", "text": "look:"},
            {"type": "image"},
            {"type": "image"},
        ]},
    ]
    ids = tok.apply_chat_template(messages, num_image_tokens=4)
    assert ids[0] == BOS_ID
    assert ids.count(IMG_ID) == 8


def test_vit_shapes(tiny_vlm):
    imgs = jnp.zeros((3, 28, 28, 3), jnp.float32)
    out = tiny_vlm.encode_images(imgs)
    assert out.shape == (3, TINY.tokens_per_image, TINY.vit_width)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_prefill_decode_consistency(tiny_vlm):
    """Teacher-forced prefill logits at position t must match stepping the
    decoder token by token (paged cache correctness)."""
    params = tiny_vlm.params["dec"]
    rng = np.random.default_rng(0)
    seq = [BOS_ID] + rng.integers(97, 122, size=30).tolist()
    T = 32  # two pages

    # full-prefill logits after the whole sequence
    ids = np.full((1, T), PAD_ID, np.int32)
    ids[0, : len(seq)] = seq
    cache = make_cache_for(TINY, 1, T, 8)
    logits_full, _ = dec.prefill(params, TINY, jnp.asarray(ids), None, cache,
                                 PAD_ID, IMG_ID)

    # prefill only the first 16 tokens, then decode-step the rest
    ids2 = np.full((1, 16), PAD_ID, np.int32)
    ids2[0, :16] = seq[:16]
    cache2 = make_cache_for(TINY, 1, 16, 8)
    logits_step, cache2 = dec.prefill(params, TINY, jnp.asarray(ids2), None,
                                      cache2, PAD_ID, IMG_ID)
    step = jax.jit(lambda p, t, c: dec.decode_step(p, TINY, t, c))
    for t in seq[16:]:
        logits_step, cache2 = step(params, jnp.asarray([t], jnp.int32), cache2)

    a = np.asarray(logits_full)[0]
    b = np.asarray(logits_step)[0]
    # absolute tolerance scaled to the logit magnitude: the two paths use
    # different contraction orders, so bit-exactness is not expected
    tol = 0.02 * max(1.0, float(np.abs(a).max()))
    np.testing.assert_allclose(a, b, rtol=0, atol=tol)
    assert a.argmax() == b.argmax()


def test_generate_shapes_and_eos(tiny_vlm):
    tok = ByteTokenizer()
    ids = pad_prompt(tok.pad_batch([tok.encode("describe the scene")]),
                     TINY.page_size)
    cache = make_cache_for(TINY, 1, ids.shape[1], 32)
    result, _ = tiny_vlm.generate(
        jnp.asarray(ids), None, cache, jax.random.PRNGKey(1),
        max_new_tokens=32, temperature=0.0)
    toks = np.asarray(result.tokens)
    assert toks.shape == (1, 32)
    n = int(result.lengths[0])
    # tokens after the generated length are PAD
    assert (toks[0, n:] == PAD_ID).all()


def test_generate_with_images(tiny_vlm):
    tok = ByteTokenizer()
    messages = [{"role": "user", "content": [
        {"type": "image"}, {"type": "text", "text": "what is this?"}]}]
    ids_list = tok.apply_chat_template(messages,
                                       num_image_tokens=TINY.tokens_per_image)
    ids = pad_prompt(tok.pad_batch([ids_list]), TINY.page_size)
    imgs = jnp.asarray(np.random.default_rng(0)
                       .uniform(-1, 1, (1, 28, 28, 3)).astype(np.float32))
    emb = tiny_vlm.encode_images(imgs)
    cache = make_cache_for(TINY, 1, ids.shape[1], 32)
    result, _ = tiny_vlm.generate(
        jnp.asarray(ids), emb, cache, jax.random.PRNGKey(2),
        max_new_tokens=8, temperature=0.0)
    assert np.asarray(result.tokens).shape == (1, 8)


def test_truncate_head_tail_img_aware():
    """Truncation must never cut through an IMG placeholder run (that
    would shift every later image onto the wrong ViT embedding)."""
    from msc_tpu.models.tokenizer import ByteTokenizer, IMG_ID

    tok = ByteTokenizer(512)
    tpi = 16
    # 3 images interleaved with long text, over the limit
    ids = ([1] * 100 + [IMG_ID] * tpi + [2] * 300 + [IMG_ID] * tpi
           + [3] * 300 + [IMG_ID] * tpi + [4] * 100)
    limit = 256
    out = tok.truncate_head_tail(ids, limit, img_id=IMG_ID)
    assert len(out) <= limit
    # every surviving IMG run is exactly tpi long (atomic)
    runs, i = [], 0
    while i < len(out):
        if out[i] == IMG_ID:
            j = i
            while j < len(out) and out[j] == IMG_ID:
                j += 1
            runs.append(j - i)
            i = j
        else:
            i += 1
    # adjacent runs merge when the text between them is fully dropped;
    # atomicity means every maximal run is a whole multiple of tpi and
    # all 3 images' placeholders survive
    assert all(r % tpi == 0 for r in runs)
    assert sum(runs) == 3 * tpi  # all images kept; only text truncated

    # images alone over the budget: whole TRAILING images drop
    ids2 = [IMG_ID] * (tpi * 40) + [5] * 10
    out2 = tok.truncate_head_tail(ids2, limit, img_id=IMG_ID)
    assert len(out2) <= limit
    n_img_tokens = sum(1 for t in out2 if t == IMG_ID)
    assert n_img_tokens % tpi == 0  # whole images only
    assert out2[-10:] == [5] * 10   # text survives


def test_truncate_head_tail_no_images_unchanged():
    from msc_tpu.models.tokenizer import ByteTokenizer

    tok = ByteTokenizer(512)
    ids = list(range(200)) * 3
    old = ids[:150 // 4] + ids[-(150 - 150 // 4):]
    assert tok.truncate_head_tail(ids, 150) == old
    assert tok.truncate_head_tail(ids, 150, img_id=259) == old


# ---------------------------------------------------------------------------
# BPE tokenizer (round 2)
# ---------------------------------------------------------------------------

def test_bpe_roundtrip_and_fallback():
    from msc_tpu.models.bpe import BPETokenizer, train_bpe

    corpus = (b"the car is in front of the ego vehicle. " * 50
              + b'{"category":"car","position":"front"} ' * 30)
    merges = train_bpe(corpus, 320)
    tok = BPETokenizer(merges, vocab_size=512)
    for s in ['the car is in front', '{"category":"car"}',
              'unseen ✓ unicode éà', 'x' * 100, '']:
        assert tok.decode(tok.encode(s)) == s
    # compression on in-domain text
    s = "the car is in front of the ego vehicle. " * 5
    assert len(tok.encode(s)) < len(s) * 0.5


def test_bpe_committed_vocab_loads():
    """The committed hermetic vocabulary must load and beat 3 bytes/token
    on in-domain text."""
    from msc_tpu.models.bpe import make_tokenizer
    from msc_tpu.config import VLMConfig

    cfg = VLMConfig(vocab_size=1024, tokenizer="bpe")
    tok = make_tokenizer(cfg)
    s = ('{"scene_summary":"a car in front of the ego vehicle",'
         '"objects":[{"category":"pedestrian","position":"front left"}]}')
    ids = tok.encode(s)
    assert len(ids) < len(s) / 2.5
    assert tok.decode(ids) == s


def test_bpe_chat_template_inherited():
    from msc_tpu.models.bpe import BPETokenizer, train_bpe

    tok = BPETokenizer(train_bpe(b"hello world " * 20, 280), vocab_size=512)
    messages = [{"role": "user", "content": [
        {"type": "text", "text": "hello world"}, {"type": "image"}]}]
    ids = tok.apply_chat_template(messages, num_image_tokens=4)
    assert ids.count(IMG_ID) == 4
    assert ids[0] == BOS_ID


def test_moe_capacity_dispatch_matches_dense():
    """With ample capacity the sort-based dispatch must equal the dense
    O(E) formulation exactly (same top-k + renormalized softmax)."""
    import numpy as np
    from msc_tpu.models.decoder import _moe_ffn

    rng = np.random.default_rng(0)
    B, T, D, M, E = 2, 16, 32, 64, 4
    layer = {
        "router": jnp.asarray(rng.normal(size=(D, E)), jnp.float32),
        "we_gate": jnp.asarray(rng.normal(size=(E, D, M)) * 0.1, jnp.float32),
        "we_up": jnp.asarray(rng.normal(size=(E, D, M)) * 0.1, jnp.float32),
        "we_down": jnp.asarray(rng.normal(size=(E, M, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    dense = _moe_ffn(layer, x, jnp.float32, top_k=2, dispatch="dense")
    cap = _moe_ffn(layer, x, jnp.float32, top_k=2, dispatch="capacity",
                   capacity_factor=float(E))  # C >= N: nothing drops
    np.testing.assert_allclose(np.asarray(cap), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_overflow_gracefully():
    """Tight capacity drops contributions but stays finite/shaped."""
    import numpy as np
    from msc_tpu.models.decoder import _moe_ffn

    rng = np.random.default_rng(1)
    B, T, D, M, E = 1, 32, 16, 32, 4
    layer = {
        "router": jnp.asarray(rng.normal(size=(D, E)), jnp.float32),
        "we_gate": jnp.asarray(rng.normal(size=(E, D, M)) * 0.1, jnp.float32),
        "we_up": jnp.asarray(rng.normal(size=(E, D, M)) * 0.1, jnp.float32),
        "we_down": jnp.asarray(rng.normal(size=(E, M, D)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    out = _moe_ffn(layer, x, jnp.float32, top_k=2, dispatch="capacity",
                   capacity_factor=0.5)
    assert out.shape == (B, T, D)
    assert np.isfinite(np.asarray(out)).all()


def test_train_step_with_image_pairs():
    """Image-bearing distillation pairs (camera describe etc.) train the
    ViT path: a jitted step over (B, T) ids with (B*V, S, S, 3) images
    runs and reduces loss on repeated batches (round-2: image tasks join
    the self-distillation set)."""
    import numpy as np

    from msc_tpu.models.tokenizer import IMG_ID
    from msc_tpu.training.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    B, V, T = 2, 2, 64
    tpi = (TINY.image_size // TINY.patch_size) ** 2
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 255, size=(B, T)).astype(np.int32)
    ids[:, 1: 1 + V * tpi] = IMG_ID  # V image placeholders per row
    mask = np.zeros((B, T), bool)
    mask[:, -16:] = True
    imgs = rng.uniform(-1, 1, size=(B * V, TINY.image_size,
                                    TINY.image_size, 3)).astype(np.float32)

    params = init_vlm_params(jax.random.PRNGKey(1), TINY)
    opt = make_optimizer(lr=3e-3)
    state = init_train_state(params, opt)
    step = make_train_step(TINY, opt)
    losses = []
    for _ in range(8):
        state, loss = step(state, jnp.asarray(ids), jnp.asarray(imgs),
                           jnp.asarray(mask))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9  # learns the fixed batch
