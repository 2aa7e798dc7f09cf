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
    """Information ordering across modality ablations.  Since round 2 the
    mock cameras carry REAL scene content (annotations render as category
    boxes; the analytic camera backend detects them from pixels), so
    camera configs are no longer degenerate — annotation-bearing configs
    must still be at least as accurate as pixel-detection ones."""
    runner, df, _ = run_results
    acc = {name: runner.evaluator.compute_metrics(sub).overall_accuracy
           for name, sub in df.groupby("config_name")}
    assert acc["full"] >= 0.8, acc
    assert acc["cams_annotations"] >= 0.8, acc
    assert acc["all_cams"] >= 0.5, acc   # pixel path is informative now
    assert acc["full"] >= acc["all_cams"] - 1e-9, acc
    assert acc["lidar_only"] >= 0.5, acc


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


def _embed_of(restored, params_key="embed"):
    if isinstance(restored, dict) and "vit" in restored:
        return np.asarray(restored["dec"]["embed"])
    key = [k for k in restored if k.endswith(params_key)][0]
    return np.asarray(restored[key])


def test_checkpoint_overwrite_is_complete_then_swap(tmp_path):
    """Re-saving over an existing checkpoint must never pass through a
    state where the destination dir is absent with only a partial tmp on
    disk (orbax force=True deletes-then-writes; observed as a ~3-min
    resume-point hole per save on the m-family trainer).  save_params
    writes <path>__next then swaps; a crash between the rmtree and the
    rename leaves a COMPLETE __next that restore_params adopts."""
    import jax

    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.utils import checkpoint as ckpt
    from tests.test_models import TINY

    p1 = init_vlm_params(jax.random.PRNGKey(0), TINY)
    p2 = init_vlm_params(jax.random.PRNGKey(1), TINY)
    path = str(tmp_path / "ck")
    ckpt.save_params(path, p1)
    ckpt.save_params(path, p2)  # overwrite path: __next + swap
    assert os.path.isdir(path) and not os.path.isdir(path + "__next")
    np.testing.assert_allclose(_embed_of(ckpt.restore_params(path, like=p2)),
                               np.asarray(p2["dec"]["embed"]), rtol=1e-6)

    # simulate the crash window: destination gone, completed __next left
    os.rename(path, path + "__next")
    restored = ckpt.restore_params(path, like=p2)
    np.testing.assert_allclose(_embed_of(restored),
                               np.asarray(p2["dec"]["embed"]), rtol=1e-6)
    assert os.path.isdir(path)  # adopted back into place


# ---------------------------------------------------------------------------
# round 2: <loc>/<cam> families + camera pixel detections
# ---------------------------------------------------------------------------

def test_loc_and_which_camera_answers():
    """answer_mqa_from_caption handles the <loc> and which-camera
    families from caption positions carrying coordinates (round-1
    VERDICT item 7)."""
    from msc_tpu.serving.analytic import answer_mqa_from_caption

    caption = {"objects": [
        {"category": "car", "position": "front, 12.3m, at (12.0, 2.5)"},
        {"category": "car", "position": "back, 30.0m, at (-29.0, -7.0)"},
        {"category": "adult pedestrian",
         "position": "front left, 8.0m, at (6.0, 5.0)"},
    ]}
    loc = answer_mqa_from_caption("Where is the nearest <obj>car</obj>?",
                                  caption)
    assert "<loc>(12.0, 2.5)</loc>" in loc
    cam = answer_mqa_from_caption(
        "Which camera shows the nearest <obj>pedestrian</obj>?", caption)
    assert "<cam>front left</cam>" in cam
    dst = answer_mqa_from_caption("How far away is the nearest "
                                  "<obj>car</obj>?", caption)
    assert "<dst>12.3m</dst>" in dst


def test_question_facts_line():
    """question_facts retrieves the asked category's counts — from the
    host-injected markers in full_caption when present (authoritative
    under the vlm backend), else from caption['objects'] — and
    build_mqa_messages places it next to the question (round-2 VERDICT
    item 1: question-adjacent tally)."""
    import json as _json

    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.serving.analytic import (OBJ_MARKER, answer_mqa_from_caption,
                                          question_facts)

    markers = [
        {"category": "car", "direction": "front", "distance": 12.3,
         "position": [12.0, 2.5], "state": "stopped"},
        {"category": "car", "direction": "back", "distance": 30.0,
         "position": [-29.0, -7.0], "state": "stopped"},
        {"category": "adult pedestrian", "direction": "front left",
         "distance": 8.0, "position": [6.0, 5.0], "state": "moving"},
    ]
    caption = {"objects": [],  # model-lossy: facts must NOT come from here
               "full_caption": f"Scene.\n{OBJ_MARKER} {_json.dumps(markers)}"}
    f = question_facts("How many <obj>cars</obj> are in the scene?", caption)
    assert "2 cars in the scene" in f
    f = question_facts("How many <obj>cars</obj> are in <cam>front</cam>?",
                       caption)
    assert "1 cars in front" in f and "2 cars in the whole scene" in f
    f = question_facts("How many <obj>buses</obj> are in the scene?", caption)
    assert "0 buses in the scene" in f
    assert question_facts("What is the weather?", caption) is None
    # untagged count questions still get a fact line with the scene total
    # (round-3 ADVICE: the stripped prompt otherwise leaves the teacher
    # scene-blind and it answers <cnt>0</cnt> for every untagged count)
    f = question_facts("How many objects are in the scene?", caption)
    assert "3 objects in the scene" in f

    msgs = build_mqa_messages("How many <obj>cars</obj> are in the scene?",
                              caption)
    user = msgs[1]["content"]
    assert "Counts for this question: 2 cars in the scene" in user
    assert user.index("Question:") < user.index("Counts for this question")

    # the analytic teacher's answer agrees with the facts line when the
    # caption objects come from the same markers (distillation-time state)
    objcap = {"objects": [
        {"category": "car", "position": "front, 12.3m, at (12.0, 2.5)"},
        {"category": "car", "position": "back, 30.0m, at (-29.0, -7.0)"}]}
    ans = answer_mqa_from_caption(
        "How many <obj>cars</obj> are in the scene?", objcap)
    assert "<cnt>2</cnt>" in ans


def test_tag_content_accuracy_scoring():
    """The evaluator's tag-content extension scores cam/dst/loc content
    (with tolerance), not just <target> blocks."""
    import pandas as pd

    from msc_tpu.eval.evaluator import ComprehensiveMQAEvaluator

    rows = [
        # loc correct within 1.0
        dict(q="Where is the nearest <obj>car</obj>?",
             gt="It is at <loc>(12.0, 2.5)</loc>.",
             pred="The nearest <obj>car</obj> is at <loc>(12.3, 2.1)</loc>."),
        # loc wrong
        dict(q="Where is the nearest <obj>bus</obj>?",
             gt="It is at <loc>(5.0, 5.0)</loc>.",
             pred="At <loc>(25.0, -5.0)</loc>."),
        # cam correct via synonym normalization
        dict(q="Which camera shows the <obj>car</obj>?",
             gt="<cam>front left</cam>",
             pred="It appears in the <cam>FRONT_LEFT</cam> camera."),
        # dst within 10%
        dict(q="How far is the <obj>car</obj>?",
             gt="<dst>20.0m</dst>", pred="about <dst>21.5m</dst>"),
    ]
    df = pd.DataFrame({
        "sample_token": ["t"] * len(rows),
        "question": [r["q"] for r in rows],
        "ground_truth_answer": [r["gt"] for r in rows],
        "question_type": ["x"] * len(rows),
        "predicted_answer": [r["pred"] for r in rows],
    })
    ev = ComprehensiveMQAEvaluator(mqa_df=df.rename(
        columns={"ground_truth_answer": "answer"})[
        ["sample_token", "question", "answer", "question_type"]])
    m = ev.compute_metrics(df)
    assert m.tag_content_accuracy["loc"] == 0.5
    assert m.tag_content_accuracy["cam"] == 1.0
    assert m.tag_content_accuracy["dst"] == 1.0


def test_mock_mqa_has_loc_and_cam_questions():
    from msc_tpu.data.mqa import generate_mock_mqa
    from msc_tpu.data.nuscenes import MockNuScenesLoader

    loader = MockNuScenesLoader(num_scenes=2, samples_per_scene=1)
    df = generate_mock_mqa(loader, num_scenes=2)
    assert (df.question_type == "location").sum() >= 1
    assert (df.question_type == "camera").sum() >= 1
    loc_gt = df[df.question_type == "location"].iloc[0]["answer"]
    assert "<loc>(" in loc_gt


def test_camera_pixel_detector_matches_ground_truth():
    """The analytic camera path detects the mock-rendered category boxes
    from pixels alone; per-sextant counts match annotation ground truth
    (the camera modality is no longer boilerplate)."""
    from collections import Counter

    from msc_tpu.data.mqa import CHANNEL_TO_CAM, count_objects
    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.serving.analytic import _detect_mock_objects

    loader = MockNuScenesLoader(num_scenes=2, samples_per_scene=1)
    agree = total = 0
    for i in range(2):
        s = loader.get_sample_by_scene_index(i, 0)
        for k, name in enumerate(s["camera_names"]):
            gt = count_objects(s["annotations"], cam=CHANNEL_TO_CAM[name])
            det = Counter(d["category"]
                          for d in _detect_mock_objects(s["images"][k]))
            total += 1
            agree += (gt == dict(det))
    assert agree / total >= 0.8  # occasional overlap-merge is tolerated


def test_mqa_prompt_strips_records_and_answers_from_facts():
    """Round-3 MQA prompt contract: the embedded caption carries NO raw
    record lists (objects array and *_JSON marker lines stripped — the
    model counts records at only ~50-60% at scene scale) while the
    question-adjacent fact line, computed from the markers BEFORE the
    strip, carries every number; and the analytic teacher answers from
    that same fact line (answer_mqa_from_facts == the caption-objects
    path on every family)."""
    import json as _json

    from msc_tpu.agents.caption import build_mqa_messages
    from msc_tpu.serving.analytic import (OBJ_MARKER, AnalyticBackend,
                                          answer_mqa_from_caption,
                                          answer_mqa_from_facts,
                                          marker_objects, question_facts)

    markers = [
        {"category": "truck", "direction": "front", "distance": 10.0,
         "position": [10.0, 0.5], "state": "stopped"},
        {"category": "truck", "direction": "back_left", "distance": 20.0,
         "position": [-14.0, 14.0], "state": "stopped"},
        {"category": "car", "direction": "front", "distance": 5.5,
         "position": [5.5, 0.0], "state": "moving"},
    ]
    lossy = [{"category": "truck", "position": "front, 10.0m"}]
    caption = {"objects": lossy, "scene_summary": "street",
               "full_caption": f"Scene.\n{OBJ_MARKER} {_json.dumps(markers)}"}

    q = "How many <obj>trucks</obj> are in the scene?"
    msgs = build_mqa_messages(q, caption)
    body = msgs[1]["content"]
    scene_json = _json.loads(
        body.split("Scene Information:\n")[1].split("\n\nQuestion:")[0])
    assert "objects" not in scene_json            # record lists stripped
    assert OBJ_MARKER not in scene_json["full_caption"]
    assert "Counts for this question: 2 trucks" in body  # facts survive
    assert caption["objects"] is lossy            # caller dict untouched

    # teacher parity: fact-line answering == caption-objects answering
    # on every question family the eval asks
    cap_exact = {"objects": marker_objects(caption["full_caption"])}
    questions = [
        q,
        "How many <obj>trucks</obj> are in <cam>front camera</cam>?",
        "Is there a <obj>truck</obj> in <cam>front camera</cam>?",
        "How far is the nearest <obj>truck</obj>?",
        "Where is the <obj>truck</obj> located?",
        "Which camera shows the <obj>truck</obj>?",
        "How many <obj>buses</obj> are in the scene?",
    ]
    for qq in questions:
        facts = question_facts(qq, caption)
        assert facts is not None, qq
        assert (answer_mqa_from_facts(qq, facts)
                == answer_mqa_from_caption(qq, cap_exact)), (qq, facts)

    # the analytic backend end-to-end answers from the stripped prompt
    be = AnalyticBackend()
    ans = be.complete(messages=msgs, temperature=0.0, task="mqa_answer")
    assert "<cnt>2</cnt>" in ans


def test_garbled_numbers_never_crash_matching():
    """An undertrained model can emit malformed numbers ('-4.9.9') in
    caption position strings; the matcher regexes must not feed them to
    float() (a round-3 CPU eval lost a whole config to exactly this)."""
    from msc_tpu.serving.analytic import (answer_mqa_from_caption,
                                          answer_mqa_from_facts)

    cap = {"objects": [{"category": "truck",
                        "position": "back, -4.9.9m, at (-4.9.9, 7..0)"}]}
    q = "How many <obj>trucks</obj> are in the scene?"
    assert "<cnt>1</cnt>" in answer_mqa_from_caption(q, cap)
    assert answer_mqa_from_facts(
        q, "Counts for this question: 1 trucks in the scene; "
           "nearest 4.9.9m away in back at (-4.9.9, 7..0).") is not None
