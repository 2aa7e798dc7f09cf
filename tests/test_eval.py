"""Evaluation-stack tests: evaluator parity semantics, ablation runner with
incremental persistence + resume, baseline, visualizer, checkpointing."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from msc_tpu.config import ModelConfig
from msc_tpu.data.mqa import generate_mock_mqa
from msc_tpu.data.nuscenes import MockNuScenesLoader
from msc_tpu.eval.baseline import RawVLMBaseline, describe_annotations
from msc_tpu.eval.configs import ModalityConfigGenerator
from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator
from msc_tpu.eval.runner import ComprehensiveMQARunner
from msc_tpu.pipeline import SemanticCaptioningPipeline
from msc_tpu.serving.analytic import AnalyticBackend
from msc_tpu.serving.client import ChatClient


@pytest.fixture(scope="module")
def small_loader():
    return MockNuScenesLoader(num_scenes=2, samples_per_scene=1)


@pytest.fixture(scope="module")
def mqa_df(small_loader):
    return generate_mock_mqa(small_loader, num_scenes=2, samples_per_scene=1)


@pytest.fixture(scope="module")
def evaluator(mqa_df):
    return ComprehensiveMQAEvaluator(mqa_df=mqa_df)


# -- evaluator parity semantics ----------------------------------------------

def test_answer_tag_parsing(evaluator):
    parsed = evaluator.parse_tags_from_answer(
        "<ans>yes</ans>, there are <target><cnt>3</cnt> <obj>cars</obj>"
        "</target> and <target><cnt>1</cnt> <obj>bus</obj></target> "
        "<cam>front</cam>.")
    assert parsed["objects"] == [{"count": 3, "object": "cars"},
                                 {"count": 1, "object": "bus"}]
    assert parsed["binary_answer"] == "yes"
    assert parsed["camera"] == "front"


def test_gt_variant_handling(evaluator):
    # GT carries ':'-separated variants; first taken
    parsed = evaluator.parse_ground_truth_answer(
        "There are <target><cnt>2</cnt> <obj>cars</obj></target>.:"
        "Alt variant <target><cnt>9</cnt> <obj>cars</obj></target>.")
    assert parsed["objects"] == [{"count": 2, "object": "cars"}]


def test_compare_answers_semantics(evaluator):
    gt = [{"count": 2, "object": "cars"}]
    exact = evaluator.compare_answers([{"count": 2, "object": "car"}], gt)
    assert exact["exact_match"] == 1.0  # synonym-normalized
    wrong_count = evaluator.compare_answers([{"count": 3, "object": "car"}], gt)
    assert wrong_count["exact_match"] == 0.0
    assert wrong_count["object_match"] == 1.0
    both_empty = evaluator.compare_answers([], [])
    assert both_empty["exact_match"] == 1.0
    miss = evaluator.compare_answers([], gt)
    assert miss["exact_match"] == 0.0


def test_active_config_set():
    configs = ModalityConfigGenerator.generate_all_configs()
    assert list(configs) == ["all_cams", "lidar_only", "cams_lidar",
                             "cams_annotations", "full"]
    extended = ModalityConfigGenerator.generate_all_configs(
        include_extended=True)
    assert "front_cams" in extended and "cam_0_only" in extended


# -- full ablation run on the analytic backend --------------------------------

@pytest.fixture(scope="module")
def run_results(small_loader, mqa_df, tmp_path_factory):
    pipeline = SemanticCaptioningPipeline(
        ModelConfig(), backend=AnalyticBackend(), verbose=False)
    runner = ComprehensiveMQARunner(pipeline, small_loader, mqa_df=mqa_df)
    out_csv = str(tmp_path_factory.mktemp("eval") / "results.csv")
    df = runner.run_complete_evaluation(test_mode=True, num_test_scenes=2,
                                        output_csv=out_csv)
    return runner, df, out_csv


def test_runner_row_schema(run_results):
    _, df, _ = run_results
    expected = {"index", "sample_token", "question", "ground_truth_answer",
                "question_type", "config_name", "used_cam_0", "used_cam_1",
                "used_cam_2", "used_cam_3", "used_cam_4", "used_cam_5",
                "used_lidar", "used_annotations", "predicted_answer",
                "final_scene_caption"}
    assert expected <= set(df.columns)
    assert set(df["config_name"]) == {"all_cams", "lidar_only", "cams_lidar",
                                      "cams_annotations", "full"}


def test_ablation_information_ordering(run_results):
    """Annotation-bearing configs must beat camera-only on mock scenes
    (cameras carry no object info in the synthetic data)."""
    runner, df, _ = run_results
    acc = {name: runner.evaluator.compute_metrics(sub).overall_accuracy
           for name, sub in df.groupby("config_name")}
    assert acc["full"] >= 0.8, acc
    assert acc["cams_annotations"] >= 0.8, acc
    assert acc["full"] > acc["all_cams"], acc
    assert acc["lidar_only"] > acc["all_cams"] - 1e-9, acc


def test_runner_resume(run_results, small_loader, mqa_df):
    """A rerun against the same CSV must skip all finished work."""
    runner, df, out_csv = run_results

    class ExplodingPipeline:
        def process_scene(self, **kw):
            raise AssertionError("resume failed: pipeline was re-invoked")

        def answer_mqa_batch(self, q, r):
            raise AssertionError("resume failed")

    r2 = ComprehensiveMQARunner(ExplodingPipeline(), small_loader,
                                mqa_df=mqa_df)
    df2 = r2.run_complete_evaluation(test_mode=True, num_test_scenes=2,
                                     output_csv=out_csv, resume=True)
    assert len(df2) == len(df)


def test_visualizer(run_results, tmp_path):
    from msc_tpu.eval.graphs import MQAResultsVisualizer

    _, _, out_csv = run_results
    viz = MQAResultsVisualizer(out_csv, output_dir=str(tmp_path))
    paths = viz.generate_all()
    assert len(paths) >= 3
    assert all(os.path.exists(p) for p in paths)


# -- baseline ------------------------------------------------------------------

def test_baseline_evaluation(small_loader, mqa_df, tmp_path):
    baseline = RawVLMBaseline(ChatClient(AnalyticBackend()))
    df = baseline.run_baseline_evaluation(
        small_loader, mqa_df=mqa_df, test_mode=True, num_test_scenes=1,
        output_dir=str(tmp_path))
    assert len(df) > 0
    ev = ComprehensiveMQAEvaluator(mqa_df=mqa_df)
    m = ev.compute_metrics(df)
    # annotation summaries flow into the caption -> counts answerable
    assert m.overall_accuracy >= 0.8, m.overall_accuracy


def test_describe_annotations(mock_sample):
    text = describe_annotations(mock_sample["annotations"])
    assert "Annotation summary" in text
    assert "- " in text


# -- checkpointing ---------------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    import jax

    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.utils import checkpoint as ckpt
    from tests.test_models import TINY

    params = init_vlm_params(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "ckpt")
    ckpt.save_params(path, params)
    restored = ckpt.restore_params(path, like=params)
    if isinstance(restored, dict) and "vit" in restored:
        a = np.asarray(restored["dec"]["embed"])
    else:  # numpy fallback layout
        key = [k for k in restored if k.endswith("embed")][0]
        a = np.asarray(restored[key])
    np.testing.assert_allclose(a, np.asarray(params["dec"]["embed"]),
                               rtol=1e-6)
