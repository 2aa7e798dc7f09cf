"""Self-distillation: train the VLM on the pipeline's own agent outputs.

The quality path of the framework (SURVEY.md hard part #2): the analytic
backend produces deterministic, correct responses for EVERY agent task
(captions, scene graphs, suggestions, edits, MQA answers) from the
information in the prompt; recording one full pipeline pass per scene
yields supervised (serving-prompt, target) pairs for all of them.
Fine-tuning the on-TPU VLM on that corpus moves the ``vlm`` backend from
random bytes toward analytic-backend parity (round-1 VERDICT item 1).
The same recipe applies verbatim to distilling from a larger teacher or
real-data captions.

Structured-output targets are canonicalized to the exact constrained-
decoding surface (compact separators, schema field order, DFA size
bounds) so the model never trains on token sequences the serving DFA
masks out.

Usage:
    python -m msc_tpu.training.distill [--scenes 96] [--steps 20000]
        [--tasks all|mqa] [--preset msc-vlm-s] [--save ckpt_dir]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Tuple


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------

def canonicalize_for_dfa(schema, text: str) -> str:
    """Re-serialize a structured response into the exact form the
    constrained-decoding DFA admits: compact separators, schema field
    order (pydantic declaration order), strings/arrays/numbers clamped to
    the DFA bounds.  Training targets MUST be in this form or the model
    learns tokens the serving-time mask forbids."""
    from msc_tpu.serving.structured import pydantic_to_spec

    spec = pydantic_to_spec(schema) if isinstance(schema, type) else schema
    if spec.get("type") in ("template", "oneof"):
        # raw-text automaton (e.g. the MQA answer templates,
        # agents/caption.py mqa_response_format): the analytic teacher's
        # answer IS the canonical form by construction — the template
        # parts mirror _format_mqa_answer branch for branch.  Verify it
        # walks the DFA (a train/serve format drift must fail LOUDLY at
        # dataset-build time, not silently train unreachable targets).
        from msc_tpu.serving.structured import compile_schema_cached

        dfa = compile_schema_cached(spec, 256)
        s = 0
        for b in text.encode():
            s = int(dfa.trans[s, b])
            if s < 0:
                raise ValueError(
                    f"template target not DFA-admissible at byte {b!r}: "
                    f"{text[:120]!r}")
        if not dfa.accept[s]:
            raise ValueError(
                f"template target stops outside an accept state: "
                f"{text[:120]!r}")
        return text
    obj = json.loads(text)

    def clamp(node, val):
        if "enum" in node:
            return val if val in node["enum"] else node["enum"][0]
        t = node.get("type")
        if t == "object":
            return {k: clamp(sub, (val or {}).get(k))
                    for k, sub in node["properties"].items()}
        if t == "array":
            items = val if isinstance(val, list) else []
            return [clamp(node["items"], v)
                    for v in items[: int(node.get("maxItems", 6))]]
        if t == "string":
            s = "" if val is None else str(val)
            # keep the DFA's printable-ASCII alphabet (whitespace controls
            # become spaces so words don't glue together); '"' and '\'
            # survive — the DFA's escape sub-automaton admits them, one
            # chain position per logical character
            s = "".join(c if 32 <= ord(c) < 127 else " " for c in s)
            return s[: int(node.get("maxLength", 48))].strip()
        if t == "integer":
            try:
                v = int(val)
            except (TypeError, ValueError):
                v = 0
            lim = 10 ** int(node.get("maxDigits", 7)) - 1
            return max(-lim, min(lim, v))
        if t == "number":
            try:
                v = float(val)
            except (TypeError, ValueError):
                v = 0.0
            lim = 10 ** int(node.get("maxDigits", 7)) - 1
            v = max(-lim, min(lim, v))
            out = round(v, 4)
            return int(out) if out == int(out) else out
        if t == "boolean":
            return bool(val)
        if t == "null":
            return None
        raise ValueError(f"unsupported node: {node}")

    return json.dumps(clamp(spec, obj), separators=(",", ":"))


def _curriculum() -> str:
    """MSC_CURRICULUM: "" (v1), "v2", or "v3".  Env-gated so a watchdog
    restart of an in-flight run recomputes the same dataset cache key it
    started with; each version carries a distinct key (see build cache
    key).  v2 adds tag-family (camera/distance/location) copy pairs;
    v3 = v2 with the tag families OVERSAMPLED 2x (round-5 probe: after
    r14's v2 schedule the nearest-payload copy circuit still never
    formed — 0/9 slot copies on fresh synthetic prompts) and is meant
    to run under MSC_FACTS=v3 so the slot value is the first value
    after the fact-line colon (the motif the count circuit formed on)."""
    return os.environ.get("MSC_CURRICULUM", "").lower()


def _curriculum_v2() -> bool:
    return _curriculum() in ("v2", "v3")


def _random_copy_pairs(caption: Dict, scene_i: int,
                       n_variants: int = 2) -> List[tuple]:
    """Unmemorizable copy-curriculum: fact-copy pairs over SYNTHETIC
    marker payloads with per-pair random counts.

    Diagnosis (round 3): with 148 fixed training scenes over ~17 epochs,
    the model minimized loss by memorizing scene→count associations —
    held-out prompts carried a CORRECT question-adjacent facts line in
    78/78 cases, yet the model copied it only 61% of the time.  Random
    counts make memorization useless: the only strategy that fits these
    pairs is the copy circuit itself (read "Counts for this question:
    N ..." → emit <cnt>N</cnt>).

    Each variant keeps the scene's prose but replaces the marker line
    with a random multiset of categories/views/distances, rebuilds the
    COUNTS tally with the same host function serving uses, and asks
    count/existence questions about present AND absent categories.  The
    marker name alternates OBJECTS_JSON/DETECTIONS_JSON so the circuit
    forms on lidar-style captions too (held-out lidar_only 39.6%)."""
    import numpy as np

    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.data.mqa import CATEGORY_TO_MQA_OBJECT, CHANNEL_TO_CAM
    from msc_tpu.serving.analytic import answer_mqa_from_caption
    from msc_tpu.utils.markers import append_counts

    cats = sorted(set(CATEGORY_TO_MQA_OBJECT.values()))
    cams = list(CHANNEL_TO_CAM.values())
    text = str(caption.get("full_caption", ""))
    prose = "\n".join(
        l for l in text.splitlines()
        if not (l.startswith(("OBJECTS_JSON:", "DETECTIONS_JSON:",
                              "CAMERAS_JSON:", "COUNTS:"))))[:1200]

    pairs: List[tuple] = []
    for v in range(n_variants):
        rng = np.random.default_rng(scene_i * 7919 + v)
        present = rng.choice(len(cats), size=int(rng.integers(3, 7)),
                             replace=False)
        objs = []
        for ci in present:
            for _ in range(int(rng.integers(1, 5))):
                objs.append({
                    "category": cats[ci],
                    "direction": cams[int(rng.integers(0, len(cams)))],
                    "distance": round(float(rng.uniform(3.0, 60.0)), 1),
                    "position": [round(float(rng.uniform(-40, 40)), 1),
                                 round(float(rng.uniform(-40, 40)), 1),
                                 0.0],
                })
        marker = "OBJECTS_JSON:" if v % 2 == 0 else "DETECTIONS_JSON:"
        # objects mirrors question_facts's marker→pseudo conversion so
        # the prompt's facts line and the analytic target agree exactly
        pseudo = [{"category": o["category"],
                   "position": (f"{o['direction']}, {o['distance']:.1f}m, "
                                f"at ({o['position'][0]:.1f}, "
                                f"{o['position'][1]:.1f})")}
                  for o in objs]
        cap_v = {"full_caption": append_counts(
            prose + "\n" + marker + " " + json.dumps(objs)),
            "objects": pseudo}

        questions: List[str] = []
        for obj in cats:
            plural = obj if obj.endswith("s") else obj + "s"
            questions.append(f"How many <obj>{plural}</obj> are in the scene?")
        # two random per-camera questions per variant
        for _ in range(2):
            obj = cats[int(rng.integers(0, len(cats)))]
            cam = cams[int(rng.integers(0, len(cams)))]
            plural = obj if obj.endswith("s") else obj + "s"
            questions.append(
                f"How many <obj>{plural}</obj> are in <cam>{cam}</cam>?")
            questions.append(f"Is there a <obj>{obj}</obj> in <cam>{cam}</cam>?")
        if _curriculum_v2():
            # tag-family copy pairs (curriculum v2): camera/distance/
            # location questions had NO synthetic coverage — only ~1
            # organic question per scene each — and are the weakest read
            # families (round-4 held-out: the model contradicts a correct
            # fact line on 48/58 <cam>, 48/58 <dst>, 44/58 <loc> rows).
            # The fact line carries the nearest match's distance/view/
            # (x, y); these pairs train the copy circuit for all three
            # templates, over present AND absent categories (the
            # "no camera shows"/"unknown" templates must form too).
            # v3 doubles the tag-family draw (8 categories vs 4): random
            # draws over the 11-class space naturally mix present and
            # absent categories, so the absent-form templates ("no camera
            # shows", "unknown", "not visible") train too
            for _ in range(8 if _curriculum() == "v3" else 4):
                obj = cats[int(rng.integers(0, len(cats)))]
                questions.append(
                    f"How far away is the nearest <obj>{obj}</obj>?")
                questions.append(f"Where is the nearest <obj>{obj}</obj>?")
                questions.append(
                    f"Which camera shows the nearest <obj>{obj}</obj>?")
        pairs.extend((build_mqa_messages(q, cap_v),
                      answer_mqa_from_caption(q, cap_v), None,
                      "mqa_answer", [])
                     for q in questions)
    return pairs


def _fact_copy_pairs(caption: Dict, scene_i: int) -> List[tuple]:
    """Synthetic mqa_answer pairs covering EVERY category once per scene
    (plus a rotating per-camera subset): prompt via the canonical
    ``build_mqa_messages`` (which injects the question-adjacent facts
    line) and target via the analytic answerer — the exact (prompt,
    answer) function serving runs, at zero model-call cost.  The organic
    MQA set asks ~17 random questions/scene, too thin for the model to
    learn the copy-the-facts-line skill uniformly across an 11-class
    space (r8: held-out count_scene 24.6%)."""
    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.data.mqa import CATEGORY_TO_MQA_OBJECT, CHANNEL_TO_CAM
    from msc_tpu.serving.analytic import answer_mqa_from_caption

    cats = sorted(set(CATEGORY_TO_MQA_OBJECT.values()))
    cams = list(CHANNEL_TO_CAM.values())
    questions: List[str] = []
    for obj in cats:
        plural = obj if obj.endswith("s") else obj + "s"
        questions.append(f"How many <obj>{plural}</obj> are in the scene?")
    # rotating camera/category subset keeps the per-scene augmentation
    # compact (~29 pairs) while covering every (cat, cam) combination
    # across the training scenes
    for k in range(3):
        obj = cats[(scene_i * 3 + k) % len(cats)]
        plural = obj if obj.endswith("s") else obj + "s"
        for c in range(2):
            cam = cams[(scene_i * 2 + c + k) % len(cams)]
            questions.append(
                f"How many <obj>{plural}</obj> are in <cam>{cam}</cam>?")
            questions.append(f"Is there a <obj>{obj}</obj> in <cam>{cam}</cam>?")
    for k in range(2):
        obj = cats[(scene_i + k * 5) % len(cats)]
        questions.append(f"How far away is the nearest <obj>{obj}</obj>?")
        questions.append(f"Where is the nearest <obj>{obj}</obj>?")
        questions.append(f"Which camera shows the nearest <obj>{obj}</obj>?")
    return [(build_mqa_messages(q, caption),
             answer_mqa_from_caption(q, caption), None, "mqa_answer", [])
            for q in questions]


def build_multitask_dataset(num_scenes: int, holdout: int = 8,
                            tasks: str = "all",
                            config_names: Tuple[str, ...] = ("full",),
                            include_images: bool = True,
                            image_size: int = 224,
                            cache_dir: str | None = None):
    """Record (serving prompt, analytic target) pairs for every agent task.

    ``cache_dir`` (or env MSC_DATASET_CACHE): pickle the built dataset,
    keyed by the build arguments.  The build is deterministic given the
    arguments AND the pipeline code, so a stale cache after a pipeline/
    teacher change must be deleted by hand (the cache exists to keep the
    scarce TPU window free of the ~CPU-bound dataset construction —
    pre-build on CPU, then train the moment the chip is reachable).

    Returns (train_pairs, eval_pairs, holdout_scene_indices); pairs are
    (messages, target_text, gt_answer_or_None, task, images).  With
    ``include_images`` the image-bearing calls (camera describe, cluster
    classify, BEV interpretation) are kept, with their frames downscaled
    to the ViT input size — the analytic camera teacher is pixel-grounded
    (serving/analytic.py _camera), so these pairs supervise the vision
    path on real mock-world content.  Without it they are skipped (text
    tasks still carry the MQA-relevant information via the OBJECTS_JSON/
    DETECTIONS_JSON markers).
    """
    import pickle

    cache_dir = cache_dir or os.environ.get("MSC_DATASET_CACHE", "")
    cache_file = None
    if cache_dir:
        from msc_tpu.config import LiDARConfig

        # dataset-content discriminators must be part of the key: a cached
        # no-hints/v1 dataset must never serve a hints/v2 run (and vice
        # versa)
        from msc_tpu.serving.analytic import facts_version

        hints = "_hints" if LiDARConfig().classify_hints else ""
        cur = {"v2": "_cur2", "v3": "_cur3"}.get(_curriculum(), "")
        facts = "_facts3" if facts_version() == "v3" else ""
        key = (f"ds_{tasks}_{'-'.join(config_names)}_{num_scenes}"
               f"_{holdout}_{int(include_images)}_{image_size}"
               f"{hints}{cur}{facts}.pkl")
        cache_file = os.path.join(cache_dir, key)
        if os.path.isfile(cache_file):
            with open(cache_file, "rb") as f:
                out = pickle.load(f)
            print(f"dataset loaded from cache: {cache_file}", flush=True)
            return out

    from msc_tpu.config import ModalityConfig
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.eval.configs import ModalityConfigGenerator
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.analytic import AnalyticBackend
    from msc_tpu.serving.client import RecordingBackend

    recorder = RecordingBackend(AnalyticBackend(),
                                record_images=include_images,
                                image_size=image_size)
    loader = MockNuScenesLoader(num_scenes=num_scenes, samples_per_scene=1)
    pipeline = SemanticCaptioningPipeline(backend=recorder, verbose=False)
    mqa = generate_mock_mqa(loader, num_scenes=num_scenes,
                            samples_per_scene=1)

    all_configs = ModalityConfigGenerator.generate_all_configs()
    if config_names == ("rotate",):
        # per-scene config rotation: every ablation config appears in the
        # training distribution at the SAME dataset-build cost as
        # full-only — without it the model only ever sees captions whose
        # markers come from annotations (OBJECTS_JSON) and cannot answer
        # from DETECTIONS_JSON/CAMERAS_JSON-only captions (measured:
        # lidar_only/all_cams held-out accuracy 19-20% vs full 61%).
        # lidar_only is double-weighted: DETECTIONS_JSON-only captions
        # were the weakest held-out bucket (41.9% vs 65-69% elsewhere,
        # RESULTS.md) and uniform rotation gives them only 1/5 coverage.
        rotation = list(all_configs.items())
        rotation += [(n, c) for n, c in rotation if n == "lidar_only"]
        modalities = None
    else:
        modalities = ([(n, all_configs[n]) for n in config_names]
                      if config_names != ("full",)
                      else [("full", ModalityConfig())])

    pairs_by_scene: List[List[tuple]] = []
    for i in range(num_scenes):
        sample = loader.get_sample_by_scene_index(i, 0)
        scene_pairs: List[tuple] = []
        scene_mods = (modalities if modalities is not None
                      else [rotation[i % len(rotation)]])
        for _cname, modality in scene_mods:
            recorder.take()  # drop any stale records
            result = pipeline.process_scene(
                images=sample["images"],
                camera_names=sample["camera_names"],
                point_cloud=sample["point_cloud"],
                annotations=sample["annotations"],
                modality_config=modality)
            qs = mqa[mqa["sample_token"] == sample["sample_token"]]
            gt_by_prompt: Dict[str, str] = {}
            for _, row in qs.iterrows():
                pipeline.answer_mqa(row["question"], result)
                gt_by_prompt[row["question"]] = row["answer"]
            for rec in recorder.take():
                if rec["n_images"] > 0 and not include_images:
                    continue
                if tasks == "mqa" and rec["task"] != "mqa_answer":
                    continue
                target = rec["response"]
                if rec["response_format"] is not None:
                    target = canonicalize_for_dfa(rec["response_format"],
                                                  target)
                else:
                    # the HOST carries marker lines between layers
                    # (utils/markers.py), so the model must never learn
                    # to emit them: strip them from free-text targets.
                    # This also cuts the seed/merge targets from ~1000
                    # to ~400 tokens (markers were most of the length).
                    from msc_tpu.utils.markers import marker_prefixes

                    pref = marker_prefixes()
                    target = "\n".join(
                        l for l in target.splitlines()
                        if not l.strip().startswith(pref)).strip()
                gt = None
                if rec["task"] == "mqa_answer":
                    # attach the dataset ground truth for eval bookkeeping
                    for q, a in gt_by_prompt.items():
                        if q in rec["messages"][-1]["content"]:
                            gt = a
                            break
                scene_pairs.append((rec["messages"], target, gt,
                                    rec["task"], rec["images"]))
        # fact-copy augmentation: the MQA dataset asks ~17 random
        # questions/scene, so rare categories get thin coverage of the
        # load-bearing skill — "copy the question-adjacent facts line
        # into the XML answer template".  Every category (plus a per-view
        # sweep) gets one synthetic pair per scene, prompt and target
        # built by the SAME functions the serving path uses
        # (build_mqa_messages + the analytic answerer) at zero model-call
        # cost.  r8 measured the skill NOT forming under dilution: its
        # held-out count_scene fell 46->25% while quick-eval object
        # accuracy fell 1.00->0.78.
        if tasks == "all" and not result.get("error"):
            scene_pairs.extend(_fact_copy_pairs(
                result["structured_caption"], i))
            scene_pairs.extend(_random_copy_pairs(
                result["structured_caption"], i))
        # the non-agentic baseline's tasks train too (one caption call +
        # per-question answers, eval/baseline.py): the baseline-vs-
        # pipeline comparison (the reference's central experiment,
        # `src/baseline_gpt4o.py:376-552`) is only fair if the VLM has
        # seen the baseline's prompt format as well.  Every 3rd scene is
        # plenty of format exposure — r8 recorded it for EVERY scene and
        # the ~18 extra pairs/scene diluted the MQA copy skill (held-out
        # 62.3% -> 48.9%).
        if tasks == "all" and i % 3 == 0:
            from msc_tpu.eval.baseline import RawVLMBaseline
            from msc_tpu.serving.client import ChatClient

            recorder.take()
            baseline = RawVLMBaseline(ChatClient(recorder))
            cap = baseline.generate_scene_caption(
                sample["images"], sample["camera_names"],
                sample["point_cloud"], sample["annotations"])
            for _, row in qs.iterrows():
                baseline.answer_question_from_caption(row["question"], cap)
            for rec in recorder.take():
                if rec["n_images"] > 0 and not include_images:
                    continue
                gt = None
                if rec["task"] == "baseline_answer":
                    for q, a in gt_by_prompt.items():
                        if q in rec["messages"][-1]["content"]:
                            gt = a
                            break
                scene_pairs.append((rec["messages"], rec["response"], gt,
                                    rec["task"], rec["images"]))
        pairs_by_scene.append(scene_pairs)

    train = [p for s in pairs_by_scene[:-holdout] for p in s]
    evl = [p for s in pairs_by_scene[-holdout:] for p in s]
    holdout_idx = list(range(num_scenes - holdout, num_scenes))
    if cache_file:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_file + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((train, evl, holdout_idx), f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, cache_file)
        print(f"dataset cached -> {cache_file}", flush=True)
    return train, evl, holdout_idx


def build_mqa_dataset(num_scenes: int, holdout: int = 4):
    """Back-compat wrapper: MQA-only pairs as (messages, answer, gt)."""
    train, evl, _ = build_multitask_dataset(num_scenes, holdout,
                                            tasks="mqa",
                                            include_images=False)
    strip = lambda ps: [(p[0], p[1], p[2]) for p in ps]
    return strip(train), strip(evl)


def tokenize_pairs(pairs, tokenizer, max_len: int,
                   num_image_tokens: int = 0):
    """(messages, target, ...) pairs -> (ids, loss_mask) arrays.

    num_image_tokens: IMG placeholders per image part (pass
    cfg.tokens_per_image for image-bearing pairs; serving uses the same
    expansion, engine._tokenize)."""
    import numpy as np

    from msc_tpu.models.tokenizer import EOS_ID, IMG_ID, PAD_ID

    ids = np.full((len(pairs), max_len), PAD_ID, np.int32)
    mask = np.zeros((len(pairs), max_len), bool)
    for i, pair in enumerate(pairs):
        messages, answer = pair[0], pair[1]
        prompt = tokenizer.apply_chat_template(
            messages, num_image_tokens=num_image_tokens)
        target = tokenizer.encode(answer) + [EOS_ID]
        # SAME truncation as the serving engine (train/serve alignment),
        # then fit prompt+target into max_len (IMG runs are atomic)
        prompt = tokenizer.truncate_head_tail(prompt, 2048, img_id=IMG_ID)
        # the full target (incl. EOS) must stay supervised — the prompt
        # yields; only a target that alone exceeds max_len gets clipped
        budget = max(1, max_len - len(target))
        prompt = tokenizer.truncate_head_tail(prompt, budget, img_id=IMG_ID)
        seq = (prompt + target)[:max_len]
        ids[i, : len(seq)] = seq
        mask[i, len(prompt): len(seq)] = True
    return ids, mask


def evaluate(engine, pairs, max_eval: int = 60):
    """Exact/object-match accuracy of the engine's answers vs ground truth
    (MQA pairs only)."""
    import pandas as pd

    from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
    from msc_tpu.serving.engine import Request

    pairs = [p for p in pairs if len(p) < 4 or p[3] == "mqa_answer"]
    pairs = pairs[:max_eval]
    reqs = [Request(messages=p[0], temperature=0.0, max_new_tokens=64)
            for p in pairs]
    preds = []
    for r in reqs:  # sequential: honest per-call serving path
        preds.append(engine.generate_batch([r])[0])
    gts = [p[2] if p[2] is not None else p[1] for p in pairs]
    df = pd.DataFrame({
        "sample_token": ["x"] * len(pairs),
        "question": [p[0][1]["content"].split("\n")[0] for p in pairs],
        "ground_truth_answer": gts,
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
    ap.add_argument("--scenes", type=int, default=96)
    ap.add_argument("--holdout", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=1536)
    ap.add_argument("--max-len-long", type=int, default=2560)
    ap.add_argument("--preset", default="msc-vlm-s")
    ap.add_argument("--tasks", default="all", choices=["all", "mqa"])
    ap.add_argument("--configs", default="full",
                    help='"full", "rotate" (per-scene ablation-config '
                         'rotation), or comma-separated config names')
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--save", default=None)
    ap.add_argument("--eval-n", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="mid-training MQA evals (0 = only before/after)")
    ap.add_argument("--save-every", type=int, default=2500,
                    help="overwrite --save dir every N steps so a crashed "
                         "run leaves a usable checkpoint (0 = final only)")
    ap.add_argument("--dataset-cache",
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__)))),
                        ".dataset_cache"),
                    help="directory for the pickled dataset cache "
                         "('' disables); pre-build on CPU with "
                         "scripts/prebuild_dataset.sh so the TPU window "
                         "starts at step 0, not at scene 0")
    ap.add_argument("--resume", action="store_true",
                    help="restore params+optimizer+step from "
                         "<save>__state and continue — the watchdog "
                         "(tools/watchdog.py) relaunches a stalled run "
                         "with this flag so no steps are lost")
    args = ap.parse_args()

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from msc_tpu.config import vlm_preset, VLMConfig
    from msc_tpu.models.bpe import make_tokenizer
    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.serving.engine import InferenceEngine
    from msc_tpu.training.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = (VLMConfig() if args.preset == "msc-vlm-s"
           else vlm_preset(args.preset))
    tokenizer = make_tokenizer(cfg)  # MUST match the serving tokenizer

    print(f"building {args.tasks}-task dataset from {args.scenes} scenes "
          f"(configs={args.configs})...")
    train_pairs, eval_pairs, _ = build_multitask_dataset(
        args.scenes, holdout=args.holdout, tasks=args.tasks,
        config_names=tuple(args.configs.split(",")),
        cache_dir=args.dataset_cache)
    from collections import Counter

    print(f"train pairs: {len(train_pairs)}, eval pairs: {len(eval_pairs)}")
    print("  by task:", dict(Counter(p[3] for p in train_pairs)))

    # length-bucketed batches: short tasks (MQA, suggest, caption) pack
    # densely; long tasks (merge, edit, scene-graph) train at a longer T
    # with a smaller B so neither truncates the other's budget.  Image
    # tasks bucket by image COUNT (the train forward reshapes (B*V,...)
    # with a uniform V per batch): camera describe carries 6 frames,
    # cluster tiles / BEV carry 1.
    tpi = cfg.tokens_per_image

    def total_len(p):
        return (len(tokenizer.apply_chat_template(p[0],
                                                  num_image_tokens=tpi))
                + len(tokenizer.encode(p[1])) + 1)

    text_pairs = [p for p in train_pairs if not p[4]]
    img_pairs = [p for p in train_pairs if p[4]]
    lens = [total_len(p) for p in text_pairs]
    short = [p for p, L in zip(text_pairs, lens) if L <= args.max_len]
    long_ = [p for p, L in zip(text_pairs, lens) if L > args.max_len]
    buckets = []  # (ids, mask, batch, images or None)
    if short:
        ids_s, mask_s = tokenize_pairs(short, tokenizer, args.max_len)
        buckets.append((ids_s, mask_s, args.batch, None))
    if long_:
        ids_l, mask_l = tokenize_pairs(long_, tokenizer, args.max_len_long)
        buckets.append((ids_l, mask_l, max(2, args.batch // 4), None))
    # bucket by (image count, frame shape): sub-threshold frames record at
    # NATIVE size (train/serve alignment, serving/client.RecordingBackend),
    # so pairs with the same count can still carry different resolutions
    by_count: Dict[tuple, list] = {}
    for p in img_pairs:
        key = (len(p[4]), tuple(np.asarray(p[4][0]).shape))
        by_count.setdefault(key, []).append(p)
    for (V, _shape), ps in sorted(by_count.items()):
        T_img = args.max_len_long if V * tpi + 512 > args.max_len \
            else args.max_len
        # drop pairs whose prompt would truncate an IMG run (image k
        # would silently land on the wrong embedding row)
        keep = [p for p in ps if total_len(p) <= T_img]
        if not keep:
            continue
        ids_i, mask_i = tokenize_pairs(keep, tokenizer, T_img,
                                       num_image_tokens=tpi)
        imgs = np.stack([np.stack(p[4]) for p in keep])  # (n,V,S,S,3) u8
        buckets.append((ids_i, mask_i, max(2, args.batch // (2 * V)), imgs))
    for ids_b, mask_b, bb, imgs_b in buckets:
        v = 0 if imgs_b is None else imgs_b.shape[1]
        print(f"  bucket T={ids_b.shape[1]} n={len(ids_b)} batch={bb} "
              f"imgs/row={v} mean len {(ids_b != 256).sum(1).mean():.0f}")

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    # warmup + cosine decay: the round-1 constant-lr run destabilized at
    # 20k steps (PERF.md); the schedule is the missing knob
    warmup = min(args.warmup, max(1, args.steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps, end_value=args.lr * 0.05)
    optimizer = make_optimizer(lr=schedule)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    def save_ckpt(st, step):
        """Serving checkpoint + full-state resume point + preset sidecar.
        All written AT save time (round-3 ADVICE: a startup-written
        sidecar dangles if the run dies before any save)."""
        from msc_tpu.utils.checkpoint import save_params

        host = jax.device_get(st)
        save_params(args.save, host.params)
        save_params(args.save + "__state", host)
        with open(os.path.abspath(args.save) + ".preset", "w") as f:
            f.write(args.preset + "\n")
        with open(os.path.abspath(args.save) + ".step", "w") as f:
            f.write(f"{step}\n")
        # prompt-flags sidecar: record the prompt-format axes this
        # checkpoint was trained on — classify hints AND fact-line
        # version — so serving always reconstructs the same prompt
        # format (pipeline.py reads it)
        from msc_tpu.config import LiDARConfig as _LC
        from msc_tpu.serving.analytic import facts_version as _fv
        with open(os.path.abspath(args.save) + ".flags", "w") as f:
            f.write(f"classify_hints={int(_LC().classify_hints)}\n")
            f.write(f"facts={_fv()}\n")

    start_step = 0
    if args.resume and args.save and \
            (os.path.isdir(os.path.abspath(args.save) + "__state")
             or os.path.isdir(os.path.abspath(args.save) + "__state__next")):
        from msc_tpu.utils.checkpoint import restore_params

        state = restore_params(os.path.abspath(args.save) + "__state",
                               like=state)
        state = type(state)(*state) if isinstance(state, tuple) else state
        step_file = os.path.abspath(args.save) + ".step"
        if os.path.isfile(step_file):
            with open(step_file) as f:
                start_step = int(f.read().strip())
        else:
            start_step = int(jax.device_get(state.step))
        print(f"resumed from {args.save}__state at step {start_step}",
              flush=True)

    if start_step == 0:
        print("pre-training eval...")
        engine = InferenceEngine(cfg, params=jax.device_get(state.params),
                                 seed=0)
        before, _ = evaluate(engine, eval_pairs, args.eval_n)
        print(f"BEFORE: {before}")
        del engine
    else:
        before = "(skipped on resume)"

    # resume seeds the stream differently so the continued run doesn't
    # replay the exact batch sequence already consumed before the crash
    rng = np.random.default_rng(start_step)
    # sample buckets proportionally to their pair counts
    weights = np.array([len(b[0]) for b in buckets], np.float64)
    weights /= weights.sum()
    import time

    t0 = time.time()
    loss = float("nan")
    # heartbeat every <=200 steps: the stall watchdog (tools/watchdog.py)
    # keys on log growth, so a 26k-step run must not go quiet for the
    # 1300 steps a steps//20 cadence would allow
    log_every = max(1, min(200, args.steps // 20))
    for step in range(start_step, args.steps):
        ids_b, mask_b, bb, imgs_b = buckets[rng.choice(len(buckets),
                                                       p=weights)]
        idx = rng.integers(0, len(ids_b), size=bb)
        imgs = None
        if imgs_b is not None:
            # (B, V, S, S, 3) u8 -> (B*V, S, S, 3) float in [-1, 1]
            # (exactly ops.image.preprocess_images at the native size)
            raw = imgs_b[idx].astype(np.float32) / 255.0 * 2.0 - 1.0
            imgs = jnp.asarray(raw.reshape((-1,) + raw.shape[2:]))
        state, loss = step_fn(state, jnp.asarray(ids_b[idx]), imgs,
                              jnp.asarray(mask_b[idx]))
        if step % log_every == 0:
            print(f"step {step:6d}  loss {float(loss):.4f}  "
                  f"({(time.time()-t0):.0f}s)", flush=True)
        if (args.save and args.save_every and step
                and step % args.save_every == 0):
            save_ckpt(state, step)
            print(f"  checkpoint@{step} -> {args.save}", flush=True)
        if args.eval_every and step and step % args.eval_every == 0:
            e = InferenceEngine(cfg, params=jax.device_get(state.params),
                                seed=0)
            mid, _ = evaluate(e, eval_pairs, args.eval_n)
            print(f"  eval@{step}: {mid}", flush=True)
            del e
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
        save_ckpt(state, args.steps)
        print(f"checkpoint -> {args.save}")


if __name__ == "__main__":
    main()
