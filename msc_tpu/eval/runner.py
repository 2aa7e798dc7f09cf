"""Ablation evaluation runner.

Parity with `src/evaluation_framework.py:458-701` (index available sample
tokens, filter MQA rows, test-mode slice by first-N unique samples, per
sample x per config: one process_scene + per-question answers, wide result
rows incl. used_cam_0..5 flags, CSV artifact, per-config analysis tables)
plus the two gaps SURVEY.md section 5 calls out:

- **incremental persistence**: result rows append to the CSV as they are
  produced (a crash no longer loses the run);
- **resume**: on restart with the same CSV, already-evaluated
  (sample_token, config, question) rows are skipped.

And a throughput lever: all of a sample/config's questions answer in one
batched model call (`SemanticCaptioningPipeline.answer_mqa_batch`).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, List, Optional

import pandas as pd

from msc_tpu.eval.configs import ModalityConfigGenerator
from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator


class ComprehensiveMQARunner:
    """Runs the complete modality-ablation MQA evaluation."""

    def __init__(self, pipeline, loader, mqa_csv_path: Optional[str] = None,
                 mqa_df: Optional[pd.DataFrame] = None,
                 batch_questions: bool = True,
                 concurrent_configs: int = 1):
        """concurrent_configs > 1 runs a sample's modality configs on
        threads sharing the pipeline; with a ContinuousBatcher backend
        their same-stage model calls coalesce into batched device calls
        (msc_tpu/serving/batching.py)."""
        self.pipeline = pipeline
        self.loader = loader
        self.evaluator = ComprehensiveMQAEvaluator(mqa_csv_path, mqa_df)
        self.config_generator = ModalityConfigGenerator()
        self.batch_questions = batch_questions
        self.concurrent_configs = max(1, concurrent_configs)

    # ------------------------------------------------------------------
    def _index_sample_tokens(self) -> set:
        tokens = set()
        for scene in self.loader.get_scene_list():
            try:
                for s in self.loader.load_scene_samples(scene["token"]):
                    tokens.add(s["sample_token"])
            except Exception as e:
                print(f"warning: scene {scene.get('name')}: {e}")
        return tokens

    @staticmethod
    def _used_cam_flags(mc) -> Dict[str, bool]:
        return {
            f"used_cam_{i}": bool(mc.use_cameras and (
                mc.camera_indices is None or i in mc.camera_indices))
            for i in range(6)
        }

    # ------------------------------------------------------------------
    def run_complete_evaluation(self, test_mode: bool = False,
                                num_test_scenes: int = 5,
                                output_csv: Optional[str] = None,
                                resume: bool = True,
                                scene_offset: int = 0,
                                config_names: Optional[List[str]] = None
                                ) -> pd.DataFrame:
        tokens = self._index_sample_tokens()
        print(f"Found {len(tokens)} available sample tokens")
        questions_df = self.evaluator.mqa_data[
            self.evaluator.mqa_data["sample_token"].isin(tokens)].copy()
        print(f"Filtered to {len(questions_df)} questions with available samples")
        if len(questions_df) == 0:
            print("ERROR: no overlap between MQA data and the dataset")
            return pd.DataFrame()

        if test_mode:
            # scene_offset selects a window into the sample list — e.g. to
            # evaluate on scenes HELD OUT from a distillation run
            uniq = questions_df["sample_token"].unique()
            keep = uniq[scene_offset: scene_offset + num_test_scenes]
            questions_df = questions_df[
                questions_df["sample_token"].isin(keep)]
            print(f"TEST MODE: {len(keep)} scenes, {len(questions_df)} questions")

        configs = self.config_generator.generate_all_configs()
        if config_names:
            unknown = set(config_names) - set(configs)
            if unknown:
                raise ValueError(f"unknown modality configs: {sorted(unknown)}"
                                 f" (have: {sorted(configs)})")
            configs = {k: v for k, v in configs.items() if k in config_names}
            print(f"CONFIG SUBSET: {sorted(configs)}")

        # resume: load already-finished (token, config, question) keys
        done = set()
        rows: List[dict] = []
        if output_csv and resume and os.path.exists(output_csv):
            prior = pd.read_csv(output_csv)
            rows = prior.drop(columns=["index"], errors="ignore") \
                        .to_dict("records")
            done = {(r["sample_token"], r["config_name"], r["question"])
                    for r in rows}
            print(f"RESUME: {len(rows)} rows already evaluated")

        def flush():
            if output_csv and rows:
                df = pd.DataFrame(rows)
                df.insert(0, "index", range(len(df)))
                df.to_csv(output_csv, index=False)

        groups = questions_df.groupby("sample_token")
        # overlap sample IO/decode with device compute
        from msc_tpu.data.prefetch import PrefetchLoader

        prefetch = (self.loader if isinstance(self.loader, PrefetchLoader)
                    else PrefetchLoader(self.loader))
        prefetch.schedule([token for token, _ in groups])
        for si, (token, sample_questions) in enumerate(groups):
            print(f"[{si + 1}/{len(groups)}] sample {token} "
                  f"({len(sample_questions)} questions)")
            try:
                sample = prefetch.load_sample(token)
            except Exception as e:
                print(f"  error loading sample: {e}")
                continue
            jobs = []
            for config_name, mc in configs.items():
                pending = [qr for _, qr in sample_questions.iterrows()
                           if (token, config_name, qr["question"]) not in done]
                if pending:
                    jobs.append((config_name, mc, pending))

            def handle(job):
                config_name, mc, pending = job
                try:
                    scene_result = self.pipeline.process_scene(
                        images=sample["images"],
                        camera_names=sample["camera_names"],
                        point_cloud=sample["point_cloud"],
                        annotations=sample["annotations"],
                        modality_config=mc)
                    if self.batch_questions:
                        answers = self.pipeline.answer_mqa_batch(
                            [q["question"] for q in pending], scene_result)
                    else:
                        answers = [self.pipeline.answer_mqa(q["question"],
                                                            scene_result)
                                   for q in pending]
                    caption = scene_result["structured_caption"]["full_caption"]
                    return config_name, mc, pending, answers, caption
                except Exception as e:  # continue-on-error parity
                    print(f"  error on config {config_name}: {str(e)[:120]}")
                    # full traceback to stderr: a skipped config costs
                    # ~19 eval rows, so the crash site must be findable
                    # from the run log (scene-159 losses in round 4 were
                    # only diagnosable by code inspection)
                    import traceback
                    traceback.print_exc()
                    return None

            if self.concurrent_configs > 1 and len(jobs) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.concurrent_configs,
                                        thread_name_prefix="msc-cfg") as pool:
                    results = list(pool.map(handle, jobs))
            else:
                results = [handle(j) for j in jobs]

            for res in results:
                if res is None:
                    continue
                config_name, mc, pending, answers, final_caption = res
                for qrow, answer in zip(pending, answers):
                    rows.append({
                        "sample_token": token,
                        "question": qrow["question"],
                        "ground_truth_answer": qrow["answer"],
                        "question_type": qrow["question_type"],
                        "config_name": config_name,
                        **self._used_cam_flags(mc),
                        "used_lidar": mc.use_lidar,
                        "used_annotations": mc.use_annotations,
                        "predicted_answer": answer,
                        "final_scene_caption": final_caption,
                    })
            flush()  # incremental persistence per sample

        results_df = pd.DataFrame(rows)
        if len(results_df):
            results_df.insert(0, "index", range(len(results_df)))
        if output_csv:
            results_df.to_csv(output_csv, index=False)
            print(f"Results saved to: {output_csv}")
        return results_df

    # ------------------------------------------------------------------
    def analyze_results(self, results_df: pd.DataFrame):
        """Overall + per-config metric tables
        (parity `evaluation_framework.py:630-701`)."""
        if len(results_df) == 0:
            print("No results to analyze")
            return None
        overall = self.evaluator.compute_metrics(results_df)
        self.evaluator.print_results(overall)

        config_rows = []
        for name in results_df["config_name"].unique():
            sub = results_df[results_df["config_name"] == name]
            m = self.evaluator.compute_metrics(sub)
            config_rows.append({
                "config": name,
                "accuracy": m.overall_accuracy,
                "count_acc": m.count_accuracy,
                "object_acc": m.object_accuracy,
                "questions": m.total_questions,
            })
        config_rows.sort(key=lambda r: r["accuracy"], reverse=True)
        print(f"\n{'Configuration':<25} {'Accuracy':<12} {'Count Acc':<12} "
              f"{'Object Acc':<12} {'Questions':<10}")
        print("-" * 70)
        for r in config_rows:
            print(f"{r['config']:<25} {r['accuracy']:<12.2%} "
                  f"{r['count_acc']:<12.2%} {r['object_acc']:<12.2%} "
                  f"{r['questions']:<10}")
        return {"overall": overall, "per_config": config_rows}


def main():
    """CLI entry: hermetic by default (mock data + synthetic MQA)."""
    import argparse

    from msc_tpu.config import Config
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import create_loader
    from msc_tpu.pipeline import SemanticCaptioningPipeline

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--test-mode", action="store_true", default=None)
    ap.add_argument("--num-scenes", type=int, default=None)
    ap.add_argument("--scene-offset", type=int, default=0,
                    help="skip the first N scenes (held-out evaluation)")
    ap.add_argument("--mock-scenes", type=int, default=None,
                    help="total synthetic scenes to generate MQA for")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--configs", default=None,
                    help="comma-separated modality-config subset "
                         "(e.g. lidar_only,cams_lidar) — re-measure "
                         "specific ablation legs without re-running "
                         "the whole sweep")
    args = ap.parse_args()

    cfg = Config.from_env()
    if args.test_mode is not None:
        cfg.eval.test_mode = args.test_mode
    if args.num_scenes is not None:
        cfg.eval.num_test_scenes = args.num_scenes
    if args.output_dir is not None:
        cfg.eval.output_dir = args.output_dir

    os.makedirs(cfg.eval.output_dir, exist_ok=True)
    loader = create_loader(cfg.data.dataroot, cfg.data.version,
                           use_mock=cfg.data.use_mock)
    pipeline = SemanticCaptioningPipeline(cfg.model, cfg.lidar, verbose=False)

    if os.path.exists(cfg.eval.mqa_csv_path):
        runner = ComprehensiveMQARunner(pipeline, loader,
                                        mqa_csv_path=cfg.eval.mqa_csv_path)
    else:
        print("MQA csv not found -> generating synthetic MQA from loader")
        n_mock = args.mock_scenes or (args.scene_offset
                                      + cfg.eval.num_test_scenes)
        if hasattr(loader, "num_scenes") and loader.num_scenes < n_mock:
            loader.num_scenes = n_mock  # synthesize enough distinct scenes
        mqa_df = generate_mock_mqa(loader, num_scenes=n_mock)
        runner = ComprehensiveMQARunner(pipeline, loader, mqa_df=mqa_df)

    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    mode = "test" if cfg.eval.test_mode else "full"
    out_csv = os.path.join(cfg.eval.output_dir,
                           f"mqa_results_{mode}_{ts}.csv")
    t0 = datetime.now()
    df = runner.run_complete_evaluation(
        test_mode=cfg.eval.test_mode,
        num_test_scenes=cfg.eval.num_test_scenes,
        output_csv=out_csv, resume=cfg.eval.resume,
        scene_offset=args.scene_offset,
        config_names=(args.configs.split(",") if args.configs else None))
    print(f"Duration: {datetime.now() - t0}")
    runner.analyze_results(df)
    if hasattr(pipeline, "timer"):
        print("\n" + pipeline.timer.report())


if __name__ == "__main__":
    main()
