"""Microbenchmark: per-step decode cost (plain vs packed layouts).

Times `decoder.decode_step_contig` per token at serving shapes on the
current backend, for two weight layouts:

- plain:  per-layer wq/wk/wv/w_gate/w_up matmuls (the training layout);
- packed: q|k|v and gate|up fused into single matmuls (pack_for_decode).

(A whole-stack fused Pallas layout was measured here and retired in
round 3 — 216 vs 177 us/step against packed; study in PERF.md.)

Also asserts greedy-token parity between the layouts over a short
decode so a faster path can never silently change outputs.

Usage:  python -m msc_tpu.tools.decode_bench [--batch 4] [--t 512]
        [--steps 64] [--preset msc-vlm-s]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--t", type=int, default=512, help="prompt length")
    ap.add_argument("--t-max", type=int, default=0,
                    help="cache span (default: t + 256)")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--preset", default="msc-vlm-s")
    ap.add_argument("--dtype", default="",
                    help="override preset dtype (bfloat16|float32) — "
                         "XLA:CPU emulates bf16 matmuls slowly, so CPU "
                         "fallback runs may want float32")
    args = ap.parse_args()

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msc_tpu.config import vlm_preset, VLMConfig
    from msc_tpu.models import decoder as dec
    from msc_tpu.models.tokenizer import IMG_ID, PAD_ID
    from msc_tpu.models.vlm import init_vlm_params
    cfg = (VLMConfig() if args.preset == "msc-vlm-s"
           else vlm_preset(args.preset))
    if args.dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=args.dtype)
    B, T = args.batch, args.t
    t_max = args.t_max or T + 256
    print(f"backend={jax.default_backend()} preset={args.preset} "
          f"B={B} T={T} t_max={t_max} steps={args.steps}")

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)["dec"]
    if cfg.dtype == "bfloat16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    params = jax.device_put(params)
    packed = dec.pack_for_decode(params)

    rng = np.random.default_rng(0)
    ids = np.full((B, T), PAD_ID, np.int32)
    ids[:, T // 4:] = rng.integers(1, min(200, cfg.vocab_size - 10),
                                   size=(B, T - T // 4))

    def run(name, p, steps):
        @jax.jit
        def decode_n(p, cache, tok):
            def body(carry, _):
                tok, cache = carry
                logits, cache = dec.decode_step_contig(p, cfg, tok, cache)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                return (tok, cache), tok

            (_, cache), toks = jax.lax.scan(body, (tok, cache), None,
                                            length=steps)
            return toks, cache

        _, cache = dec.prefill_contig(params, cfg, jnp.asarray(ids), None,
                                      t_max, PAD_ID, IMG_ID)
        tok0 = jnp.zeros((B,), jnp.int32) + 5
        toks, _ = decode_n(p, cache, tok0)   # compile + run once
        jax.block_until_ready(toks)
        _, cache = dec.prefill_contig(params, cfg, jnp.asarray(ids), None,
                                      t_max, PAD_ID, IMG_ID)
        # the un-jitted prefill queues hundreds of async dispatches; wait
        # for them so the timed window holds ONLY the decode scan
        jax.block_until_ready(cache)
        t0 = time.perf_counter()
        toks2, _ = decode_n(p, cache, tok0)
        jax.block_until_ready(toks2)
        dt = time.perf_counter() - t0
        print(f"{name:>8}: {dt / steps * 1e6:8.1f} us/step "
              f"({steps} steps, {dt * 1e3:.1f} ms total)")
        return np.asarray(toks)

    steps = args.steps
    tok_plain = run("plain", params, steps)
    tok_packed = run("packed", packed, steps)
    for name, toks in [("packed", tok_packed)]:
        same = (toks == tok_plain).mean()
        print(f"parity {name} vs plain: {same * 100:.1f}% tokens identical")


if __name__ == "__main__":
    main()
