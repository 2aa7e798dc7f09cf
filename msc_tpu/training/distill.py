"""Self-distillation: train the VLM on the pipeline's own MQA answers.

The quality path of the framework (SURVEY.md hard part #2): the analytic
backend produces deterministic, correct MQA answers from structured
captions; those (prompt, answer) pairs fine-tune the on-TPU VLM so the
``vlm`` backend's answers move from random bytes toward the tag contract.
The same recipe applies verbatim to distilling from a larger teacher or
real-data captions.

Usage:
    python -m msc_tpu.training.distill [--scenes 24] [--steps 3000]
                                       [--preset msc-vlm-s]
                                       [--save ckpt_dir]
"""

from __future__ import annotations

import argparse
import json
from typing import List, Tuple


def build_mqa_dataset(num_scenes: int, holdout: int = 4):
    """(messages, answer) pairs from analytic-pipeline captions.

    Returns (train_pairs, eval_pairs); eval scenes are disjoint.
    """
    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.analytic import AnalyticBackend, answer_mqa_from_caption

    loader = MockNuScenesLoader(num_scenes=num_scenes, samples_per_scene=1)
    pipeline = SemanticCaptioningPipeline(backend=AnalyticBackend(),
                                          verbose=False)
    mqa = generate_mock_mqa(loader, num_scenes=num_scenes,
                            samples_per_scene=1)

    pairs_by_scene: List[List[Tuple[List[dict], str]]] = []
    for i in range(num_scenes):
        sample = loader.get_sample_by_scene_index(i, 0)
        result = pipeline.process_scene(
            images=sample["images"], camera_names=sample["camera_names"],
            point_cloud=sample["point_cloud"],
            annotations=sample["annotations"])
        caption = result["structured_caption"]
        scene_pairs = []
        qs = mqa[mqa["sample_token"] == sample["sample_token"]]
        for _, row in qs.iterrows():
            answer = answer_mqa_from_caption(row["question"], caption)
            messages = build_mqa_messages(row["question"], caption)
            scene_pairs.append((messages, answer, row["answer"]))
        pairs_by_scene.append(scene_pairs)

    train = [p for s in pairs_by_scene[:-holdout] for p in s]
    evl = [p for s in pairs_by_scene[-holdout:] for p in s]
    return train, evl


def tokenize_pairs(pairs, tokenizer, max_len: int):
    import numpy as np

    from msc_tpu.models.tokenizer import EOS_ID, PAD_ID

    ids = np.full((len(pairs), max_len), PAD_ID, np.int32)
    mask = np.zeros((len(pairs), max_len), bool)
    for i, (messages, answer, _gt) in enumerate(pairs):
        prompt = tokenizer.apply_chat_template(messages)
        target = tokenizer.encode(answer) + [EOS_ID]
        # SAME truncation as the serving engine (train/serve alignment),
        # then fit prompt+target into max_len
        prompt = tokenizer.truncate_head_tail(prompt, 2048)
        prompt = tokenizer.truncate_head_tail(prompt, max_len - len(target))
        seq = prompt + target
        ids[i, : len(seq)] = seq
        mask[i, len(prompt): len(seq)] = True
    return ids, mask


def evaluate(engine, pairs, max_eval: int = 60):
    """Exact/object-match accuracy of the engine's answers vs ground truth."""
    from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
    import pandas as pd

    from msc_tpu.serving.engine import Request

    pairs = pairs[:max_eval]
    reqs = [Request(messages=m, temperature=0.0, max_new_tokens=64)
            for m, _a, _gt in pairs]
    preds = []
    for r in reqs:  # sequential: honest per-call serving path
        preds.append(engine.generate_batch([r])[0])
    df = pd.DataFrame({
        "sample_token": ["x"] * len(pairs),
        "question": [m[1]["content"].split("\n")[0] for m, _a, _gt in pairs],
        "ground_truth_answer": [gt for _m, _a, gt in pairs],
        "question_type": ["q"] * len(pairs),
        "predicted_answer": preds,
    })
    ev = ComprehensiveMQAEvaluator(mqa_df=df.rename(
        columns={"ground_truth_answer": "answer"})[
        ["sample_token", "question", "answer", "question_type"]])
    m = ev.compute_metrics(df)
    return {"exact": m.overall_accuracy, "object": m.object_accuracy,
            "count": m.count_accuracy}, preds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=24)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=2176)
    ap.add_argument("--preset", default="msc-vlm-s")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--save", default=None)
    ap.add_argument("--eval-n", type=int, default=40)
    args = ap.parse_args()

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msc_tpu.config import vlm_preset, VLMConfig
    from msc_tpu.models.tokenizer import ByteTokenizer
    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.serving.engine import InferenceEngine
    from msc_tpu.training.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = (VLMConfig() if args.preset == "msc-vlm-s"
           else vlm_preset(args.preset))
    tokenizer = ByteTokenizer(cfg.vocab_size)

    print(f"building dataset from {args.scenes} scenes...")
    train_pairs, eval_pairs = build_mqa_dataset(args.scenes)
    print(f"train pairs: {len(train_pairs)}, eval pairs: {len(eval_pairs)}")
    ids, mask = tokenize_pairs(train_pairs, tokenizer, args.max_len)

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(lr=args.lr)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    print("pre-training eval...")
    engine = InferenceEngine(cfg, params=jax.device_get(state.params), seed=0)
    before, _ = evaluate(engine, eval_pairs, args.eval_n)
    print(f"BEFORE: {before}")

    rng = np.random.default_rng(0)
    n = len(ids)
    losses = []
    import time

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, n, size=args.batch)
        state, loss = step_fn(state, jnp.asarray(ids[idx]), None,
                              jnp.asarray(mask[idx]))
        if step % max(1, args.steps // 20) == 0:
            losses.append(float(loss))
            print(f"step {step:5d}  loss {losses[-1]:.4f}  "
                  f"({(time.time()-t0):.0f}s)")
    print(f"final loss {float(loss):.4f} after {args.steps} steps "
          f"({time.time()-t0:.0f}s)")

    print("post-training eval...")
    trained = jax.device_get(state.params)
    engine2 = InferenceEngine(cfg, params=trained, seed=0)
    after, preds = evaluate(engine2, eval_pairs, args.eval_n)
    print(f"BEFORE: {before}")
    print(f"AFTER:  {after}")
    print("sample predictions:")
    for p in preds[:5]:
        print("  ", repr(p[:120]))

    if args.save:
        from msc_tpu.utils.checkpoint import save_params

        save_params(args.save, trained)
        print(f"checkpoint -> {args.save}")


if __name__ == "__main__":
    main()
