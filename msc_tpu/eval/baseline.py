"""Non-agentic baseline: one caption call + per-question answers.

Behavior parity with `src/baseline_gpt4o.py:29-552` (RawGPT4oBaseline):
(1) ONE vision call with all 6 camera images + a point-cloud statistics
text + per-region annotation counts -> prose scene caption at temperature
0.0; (2) each MQA question answered from that caption alone with the
nuScenes-MQA XML contract; inline evaluation + CSV.

Reference bugs not reproduced: the duplicated ``call_llm`` with the
undefined ``self.agent_name`` in its error path (`baseline_gpt4o.py:
362,370`) — this implementation uses the shared ChatClient seam.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from msc_tpu.data.mqa import CATEGORY_TO_MQA_OBJECT, camera_sextant
from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
from msc_tpu.serving.client import ChatClient

_CAPTION_SYSTEM = """You are an expert autonomous-driving scene describer.
You will receive all camera views around a vehicle plus LiDAR statistics
and object annotation summaries.  Write one comprehensive, factual prose
caption of the scene.  Include every object with its type, count, rough
direction (front, front left, front right, back, back left, back right)
and distance.  Do not summarize away counts — state them explicitly."""

_ANSWER_SYSTEM = """You are an expert at answering questions about driving scenes.
Answer from the caption only, using the nuScenes-MQA XML format:
<target><cnt>N</cnt> <obj>name</obj></target> for counts, <ans>yes/no</ans>
for existence. Be precise with counts and use the exact XML format."""


def describe_point_cloud(pc: np.ndarray) -> str:
    """LiDAR statistics text (information parity with
    `baseline_gpt4o.py:270-287`)."""
    if pc is None or len(pc) == 0:
        return "LiDAR: no point cloud available."
    d = np.hypot(pc[:, 0], pc[:, 1])
    return (f"LiDAR statistics: {len(pc)} points; "
            f"range {d.min():.1f}-{d.max():.1f} m (median {np.median(d):.1f} m); "
            f"height {pc[:, 2].min():.1f} to {pc[:, 2].max():.1f} m; "
            f"mean intensity {pc[:, 3].mean():.2f}.")


def describe_annotations(annotations: List[Dict]) -> str:
    """Per-region object counts (information parity with
    `baseline_gpt4o.py:289-327`), using the camera sextants."""
    if not annotations:
        return "Annotations: none available."
    counts: Dict[tuple, int] = {}
    for ann in annotations:
        name = CATEGORY_TO_MQA_OBJECT.get(ann["category_name"])
        if name is None:
            continue
        region = camera_sextant(ann["translation"])
        counts[(name, region)] = counts.get((name, region), 0) + 1
    lines = ["Annotation summary (object counts by camera region):"]
    for (name, region), cnt in sorted(counts.items()):
        lines.append(f"- {cnt} {name} in {region}")
    return "\n".join(lines)


class RawVLMBaseline:
    """Fair non-agentic comparison for the 4-layer pipeline."""

    def __init__(self, client: ChatClient, model: str = "msc-vlm-s"):
        self.client = client
        self.model = model

    def generate_scene_caption(self, images, camera_names, point_cloud,
                               annotations) -> str:
        content = [{"type": "text",
                    "text": f"Describe this driving scene. "
                            f"{len(camera_names)} camera views follow."}]
        for name in camera_names:
            content.append({"type": "text", "text": f"Camera: {name}"})
            content.append({"type": "image"})
        content.append({"type": "text", "text": describe_point_cloud(point_cloud)})
        content.append({"type": "text", "text": describe_annotations(annotations)})
        messages = [{"role": "system", "content": _CAPTION_SYSTEM},
                    {"role": "user", "content": content}]
        return self.client.call_llm(messages, temperature=0.0,
                                    task="baseline_caption", images=images,
                                    max_new_tokens=320)

    def answer_question_from_caption(self, question: str, caption: str) -> str:
        user = (f"Question: {question}\n\nScene caption:\n{caption}\n\n"
                "Provide a precise answer using the correct XML format.")
        messages = [{"role": "system", "content": _ANSWER_SYSTEM},
                    {"role": "user", "content": user}]
        return self.client.call_llm(messages, temperature=0.0,
                                    task="baseline_answer",
                                    max_new_tokens=64)

    # ------------------------------------------------------------------
    def run_baseline_evaluation(self, loader,
                                mqa_csv_path: Optional[str] = None,
                                mqa_df: Optional[pd.DataFrame] = None,
                                test_mode: bool = True,
                                num_test_scenes: int = 5,
                                output_dir: str = "evaluation_results",
                                scene_offset: int = 0) -> pd.DataFrame:
        """Per-sample caption + per-question answers + scoring + CSV
        (flow parity with `baseline_gpt4o.py:376-552`).  scene_offset
        selects a window into the sample list — the same held-out
        protocol as the agentic runner (eval/runner.py), so the
        baseline-vs-pipeline comparison runs on identical scenes."""
        evaluator = ComprehensiveMQAEvaluator(mqa_csv_path, mqa_df)

        tokens = set()
        for scene in loader.get_scene_list():
            try:
                for s in loader.load_scene_samples(scene["token"]):
                    tokens.add(s["sample_token"])
            except Exception as e:
                print(f"warning: {e}")
        questions = evaluator.mqa_data[
            evaluator.mqa_data["sample_token"].isin(tokens)].copy()
        if test_mode:
            uniq = questions["sample_token"].unique()
            keep = uniq[scene_offset: scene_offset + num_test_scenes]
            questions = questions[questions["sample_token"].isin(keep)]

        os.makedirs(output_dir, exist_ok=True)
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        out_csv = os.path.join(output_dir, f"baseline_results_{ts}.csv")

        import time as _time

        rows = []
        n_scenes = questions["sample_token"].nunique()
        for si, (token, qgroup) in enumerate(
                questions.groupby("sample_token")):
            t0 = _time.time()
            try:
                sample = loader.load_sample(token)
                caption = self.generate_scene_caption(
                    sample["images"], sample["camera_names"],
                    sample["point_cloud"], sample["annotations"])
            except Exception as e:
                print(f"  baseline: sample {token} failed: {str(e)[:120]}")
                continue
            for _, q in qgroup.iterrows():
                try:
                    pred = self.answer_question_from_caption(q["question"],
                                                             caption)
                except Exception as e:
                    print(f"  baseline: question failed: {str(e)[:120]}")
                    continue
                rows.append({
                    "sample_token": token,
                    "question": q["question"],
                    "ground_truth_answer": q["answer"],
                    "question_type": q["question_type"],
                    "predicted_answer": pred,
                    "scene_caption": caption,
                })
            # incremental persistence: a killed run keeps every finished
            # scene (round-3 lost a 4-scene partial to the write-at-end
            # design; parity with eval/runner.py's per-scene CSV flush)
            pd.DataFrame(rows).to_csv(out_csv, index=False)
            print(f"  baseline: scene {si + 1}/{n_scenes} ({token}) "
                  f"{len(qgroup)} questions in {_time.time() - t0:.0f}s "
                  f"-> {out_csv}", flush=True)

        df = pd.DataFrame(rows)
        df.to_csv(out_csv, index=False)
        print(f"baseline results -> {out_csv}")
        if len(df):
            metrics = evaluator.compute_metrics(df)
            evaluator.print_results(metrics)
        return df


def main():
    """CLI entry mirroring eval/runner.py's held-out protocol:

        MSC_BACKEND=vlm MSC_VLM_CKPT=ckpt/distill_rN \\
            python -m msc_tpu.eval.baseline --num-scenes 12 \\
            --scene-offset 148 --mock-scenes 160

    runs the reference's central experiment (agentic pipeline vs raw
    one-call baseline, `src/baseline_gpt4o.py:376-552`) on the SAME
    held-out scenes the pipeline is scored on."""
    import argparse

    from msc_tpu.config import Config
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import MockNuScenesLoader, create_loader
    from msc_tpu.serving.client import make_backend
    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-scenes", type=int, default=None)
    ap.add_argument("--scene-offset", type=int, default=0)
    ap.add_argument("--mock-scenes", type=int, default=None)
    ap.add_argument("--output-dir", default=None)
    args = ap.parse_args()

    cfg = Config.from_env()
    if args.num_scenes is not None:
        cfg.eval.num_test_scenes = args.num_scenes
    if args.output_dir:
        cfg.eval.output_dir = args.output_dir

    if cfg.data.use_mock or not cfg.data.dataroot:
        n_mock = args.mock_scenes or (args.scene_offset
                                      + cfg.eval.num_test_scenes)
        loader = MockNuScenesLoader(num_scenes=n_mock, samples_per_scene=1)
        mqa_df = generate_mock_mqa(loader, num_scenes=n_mock)
        mqa_csv = None
    else:
        loader = create_loader(cfg.data.dataroot, cfg.data.version)
        mqa_df = None
        mqa_csv = cfg.eval.mqa_csv_path

    client = ChatClient(make_backend(cfg.model))
    baseline = RawVLMBaseline(client, model=cfg.model.small_model)
    baseline.run_baseline_evaluation(
        loader, mqa_csv_path=mqa_csv, mqa_df=mqa_df, test_mode=True,
        num_test_scenes=cfg.eval.num_test_scenes,
        output_dir=cfg.eval.output_dir, scene_offset=args.scene_offset)


if __name__ == "__main__":
    main()
