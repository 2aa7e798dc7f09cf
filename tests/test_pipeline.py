"""End-to-end pipeline tests on the analytic + fake backends (hermetic)."""

import json

import numpy as np
import pytest

from msc_tpu.config import ModalityConfig, ModelConfig, LiDARConfig
from msc_tpu.pipeline import SemanticCaptioningPipeline
from msc_tpu.serving.client import FakeBackend
from msc_tpu.serving.analytic import AnalyticBackend
from msc_tpu.data.mqa import count_objects


@pytest.fixture(scope="module")
def pipeline():
    cfg = ModelConfig()
    cfg.backend.kind = "analytic"
    return SemanticCaptioningPipeline(cfg, backend=AnalyticBackend(),
                                      verbose=False)


@pytest.fixture(scope="module")
def full_result(pipeline, mock_sample):
    return pipeline.process_scene(
        images=mock_sample["images"],
        camera_names=mock_sample["camera_names"],
        point_cloud=mock_sample["point_cloud"],
        annotations=mock_sample["annotations"],
        modality_config=ModalityConfig(),
    )


def test_result_contract(full_result):
    """Result dict shape parity with `src/pipeline.py:106-186`."""
    assert set(full_result) == {"pipeline_stages", "structured_caption",
                                "refinement_metadata"}
    stages = full_result["pipeline_stages"]
    for key in ("layer1_content_transformation", "layer2_seed_caption",
                "layer3_refinement", "layer4_caption"):
        assert key in stages
    # full modality: camera + lidar + scene_graph + cross_modal
    agents = [o["agent"] for o in stages["layer1_content_transformation"]]
    assert agents == ["CameraAgent", "LiDARAgent", "SceneGraphAgent",
                      "CrossModalAgent"]


def test_structured_caption_schema(full_result):
    """Byte-compatible StructuredCaption keys incl. full_caption injection
    (`caption_agent.py:87`)."""
    cap = full_result["structured_caption"]
    assert set(cap) == {"scene_summary", "ego_vehicle", "objects",
                        "road_structure", "environment", "safety_critical",
                        "full_caption"}
    assert set(cap["ego_vehicle"]) == {"action", "lane_position",
                                       "speed_estimate"}
    assert set(cap["road_structure"]) == {"type", "lanes", "markings"}
    assert set(cap["environment"]) == {"lighting", "weather", "location_type"}
    for obj in cap["objects"]:
        assert set(obj) == {"category", "position", "state", "attributes",
                            "visibility"}
    json.dumps(cap)  # serializable


def test_annotations_reach_caption(full_result, mock_sample):
    """With annotations enabled, every annotated category must appear in
    the final caption objects (information-flow check)."""
    cap = full_result["structured_caption"]
    gt = count_objects(mock_sample["annotations"])
    got = {}
    from msc_tpu.eval.synonyms import normalize_object_name

    for o in cap["objects"]:
        k = normalize_object_name(o["category"])
        got[k] = got.get(k, 0) + 1
    for cat, cnt in gt.items():
        assert got.get(cat, 0) >= cnt, (cat, gt, got)


def test_refinement_metadata(full_result):
    meta = full_result["refinement_metadata"]
    assert meta["converged"] is True  # analytic suggester converges at iter 2
    assert 1 <= meta["iterations"] <= 3


def test_mqa_answer_counts(pipeline, full_result, mock_sample):
    gt = count_objects(mock_sample["annotations"])
    cat, cnt = sorted(gt.items())[0]
    q = f"How many <obj>{cat}s</obj> are in the scene?"
    answer = pipeline.answer_mqa(q, full_result)
    assert f"<cnt>{cnt}</cnt>" in answer, (q, answer, gt)


def test_camera_only_ablation(pipeline, mock_sample):
    """Camera-only config must NOT leak annotation knowledge into the
    caption (modality dropout information topology).  Camera objects come
    from PIXEL detections (the mock renderer draws annotations into the
    frames) — the telltale of annotation leakage is the ego-frame
    coordinate suffix "(x, y)", which only annotation/lidar markers
    carry."""
    result = pipeline.process_scene(
        images=mock_sample["images"],
        camera_names=mock_sample["camera_names"],
        point_cloud=mock_sample["point_cloud"],
        annotations=mock_sample["annotations"],
        modality_config=ModalityConfig(use_cameras=True, use_lidar=False,
                                       use_annotations=False),
    )
    agents = [o["agent"] for o in
              result["pipeline_stages"]["layer1_content_transformation"]]
    assert agents == ["CameraAgent"]  # no cross-modal with 1 modality
    objs = result["structured_caption"]["objects"]
    assert objs, "pixel detections should reach the caption"
    assert all("(" not in o["position"] for o in objs), \
        "coordinates in a camera-only caption imply annotation leakage"


def test_camera_subset(pipeline, mock_sample):
    result = pipeline.process_scene(
        images=mock_sample["images"],
        camera_names=mock_sample["camera_names"],
        modality_config=ModalityConfig(use_cameras=True, use_lidar=False,
                                       use_annotations=False,
                                       camera_indices=[0, 3]),
    )
    cam_out = result["pipeline_stages"]["layer1_content_transformation"][0]
    assert cam_out["camera_views"] == ["CAM_FRONT", "CAM_BACK"]


def test_lidar_only_detects_objects(pipeline, mock_sample):
    """LiDAR-only config: clustering + geometric classification must put
    detections into the caption without annotations."""
    result = pipeline.process_scene(
        images=mock_sample["images"],
        camera_names=mock_sample["camera_names"],
        point_cloud=mock_sample["point_cloud"],
        annotations=mock_sample["annotations"],
        modality_config=ModalityConfig(use_cameras=False, use_lidar=True,
                                       use_annotations=False),
    )
    lidar_out = result["pipeline_stages"]["layer1_content_transformation"][0]
    assert lidar_out["agent"] == "LiDARAgent"
    assert lidar_out["bev_metadata"]["num_objects"] > 0
    assert len(result["structured_caption"]["objects"]) > 0


def test_pipeline_with_fake_backend(mock_sample):
    """The canned-response double drives the full pipeline too (retry and
    parse-fallback paths)."""
    responses = {
        "camera_describe": "CAM_FRONT: a road.",
        "cluster_classify": {"classifications": []},
        "lidar_interpret": "Sparse scene.",
        "scene_graph": lambda m, t: json.dumps(_minimal_graph()),
        "crossmodal": "All agree.",
        "merge": "A scene.",
        "suggest": {"has_suggestions": False, "suggestions": [],
                    "reasoning": "fine"},
        "edit": {"caption": "x", "changes_made": []},
        "structure_caption": lambda m, t: json.dumps(_minimal_caption()),
        "mqa_answer": "There are <target><cnt>0</cnt> <obj>cars</obj></target>.",
        "*": "ok",
    }
    backend = FakeBackend(responses)
    pipe = SemanticCaptioningPipeline(ModelConfig(), backend=backend,
                                      verbose=False)
    result = pipe.process_scene(
        images=mock_sample["images"][:2],
        camera_names=mock_sample["camera_names"][:2],
        point_cloud=mock_sample["point_cloud"],
        annotations=mock_sample["annotations"],
    )
    assert result["structured_caption"]["scene_summary"]
    tasks = [c["task"] for c in backend.calls]
    assert "structure_caption" in tasks
    # seed focus calls present for all five areas
    assert sum(1 for t in tasks if t and t.startswith("seed:")) == 5


def _minimal_graph():
    return {
        "scene_summary": "s", "environment": {
            "lighting": "day", "weather": "clear",
            "visibility_overall": "good", "location_type": "urban"},
        "road_structure": {"road_type": "urban", "lanes": {
            "lane_count": 2, "lane_type": "urban",
            "ego_lane_position": "center", "lane_markings": []},
            "road_elements": [], "surface_condition": "dry"},
        "traffic_participants": {"vehicles": [], "cyclists": [],
                                 "vulnerable_road_users": []},
        "sidewalk_areas": {"has_sidewalk": False, "pedestrians": [],
                           "static_objects": [], "location": "none"},
        "static_infrastructure": {"barriers": [], "traffic_cones": [],
                                  "construction": [], "other": []},
        "spatial_zones": [], "safety_critical_elements": [],
        "total_objects": 0,
    }


def _minimal_caption():
    return {
        "scene_summary": "s",
        "ego_vehicle": {"action": "driving", "lane_position": "center",
                        "speed_estimate": "moderate"},
        "objects": [],
        "road_structure": {"type": "urban", "lanes": "2", "markings": []},
        "environment": {"lighting": "day", "weather": "clear",
                        "location_type": "urban"},
        "safety_critical": [],
    }


def test_parallel_l1_matches_serial(mock_sample):
    """parallel_l1=True must produce the same Layer-1 agent order and the
    same caption as the serial path (analytic backend is deterministic)."""
    from msc_tpu.config import ModelConfig

    serial = SemanticCaptioningPipeline(ModelConfig(),
                                        backend=AnalyticBackend(),
                                        verbose=False)
    par = SemanticCaptioningPipeline(ModelConfig(),
                                     backend=AnalyticBackend(),
                                     verbose=False, parallel_l1=True)
    kw = dict(images=mock_sample["images"],
              camera_names=mock_sample["camera_names"],
              point_cloud=mock_sample["point_cloud"],
              annotations=mock_sample["annotations"])
    a = serial.process_scene(**kw)
    b = par.process_scene(**kw)
    order_a = [o["agent"] for o in
               a["pipeline_stages"]["layer1_content_transformation"]]
    order_b = [o["agent"] for o in
               b["pipeline_stages"]["layer1_content_transformation"]]
    assert order_a == order_b
    assert a["structured_caption"] == b["structured_caption"]


def test_markers_survive_model_stages(mock_sample):
    """The HOST carries OBJECTS_JSON/DETECTIONS_JSON/CAMERAS_JSON marker
    lines through the seed-merge and editor stages (utils/markers.py) —
    with a FakeBackend that never reproduces markers, the final caption
    must still carry them (the round-2 full-pipeline VLM eval collapsed
    to 18% exactly because a small model cannot copy 500-token JSON
    verbatim)."""
    cfg = ModelConfig()
    cfg.backend.kind = "fake"
    fake = FakeBackend(responses={
        "*": "Fake scene prose without any marker lines.",
        "suggest": {"has_suggestions": True,
                    "suggestions": ["add detail"], "reasoning": "test"},
        "edit": {"caption": "Edited prose, markers forgotten."},
        "structure_caption": {
            "scene_summary": "fake",
            "ego_vehicle": {"action": "driving", "lane_position": "center",
                            "speed_estimate": "moderate"},
            "objects": [],
            "road_structure": {"type": "straight", "lanes": "2",
                               "markings": []},
            "environment": {"lighting": "day", "weather": "clear",
                            "location_type": "urban"},
            "safety_critical": [],
        },
    })
    pipe = SemanticCaptioningPipeline(cfg, backend=fake, verbose=False)
    result = pipe.process_scene(
        images=mock_sample["images"],
        camera_names=mock_sample["camera_names"],
        point_cloud=mock_sample["point_cloud"],
        annotations=mock_sample["annotations"],
        modality_config=ModalityConfig(),
    )
    full = result["structured_caption"]["full_caption"]
    assert "OBJECTS_JSON:" in full          # annotations (scene graph)
    # the marker payload must parse and carry the real object set
    line = next(l for l in full.splitlines()
                if l.strip().startswith("OBJECTS_JSON:"))
    objs = json.loads(line.split(":", 1)[1])
    assert len(objs) == len(mock_sample["annotations"])
    # pixel-grounded camera detections appended by the camera agent
    assert "CAMERAS_JSON:" in full


def test_carry_markers_drops_corrupt_and_appends():
    from msc_tpu.utils.markers import carry_markers

    src = 'prose\nOBJECTS_JSON: [{"category": "car"}]\nmore'
    # model output mangled one marker and truncated another
    out = 'edited prose\nOBJECTS_JSON: [{"cat\nDETECTIONS_JSON: [{"x":'
    carried = carry_markers(out, [src])
    lines = carried.splitlines()
    assert lines[0] == "edited prose"
    assert lines[-1] == 'OBJECTS_JSON: [{"category": "car"}]'
    assert sum(l.startswith("OBJECTS_JSON") for l in lines) == 1
    assert not any(l.startswith("DETECTIONS_JSON") for l in lines)


def test_counts_marker_appended_to_full_caption(full_result, mock_sample):
    """Layer 4 appends a host-computed COUNTS tally of the marker objects
    to full_caption as natural-language lines (count answers become a
    read-off instead of model arithmetic)."""
    import re

    full = full_result["structured_caption"]["full_caption"]
    scene_line = next(l for l in full.splitlines()
                      if l.strip().startswith("COUNTS: scene:"))
    total = sum(int(n) for n in
                re.findall(r"(\d+) [a-z]", scene_line.split(":", 2)[2]))
    assert total == len(mock_sample["annotations"])
    # at least one per-view tally line
    assert any(l.strip().startswith("COUNTS: ")
               and not l.strip().startswith("COUNTS: scene:")
               for l in full.splitlines())


def test_parse_classifications_sanitizes_model_json():
    """Garbage-typed model JSON (int/float categories, string confidence,
    string cluster ids) must not leak into detections: a non-string
    category key crashes every later sorted() over the counts dicts
    ("'<' not supported between instances of 'int' and 'str'" — the
    round-4 scene-159 eval losses)."""
    import json as _json

    from msc_tpu.agents.lidar import LiDARAgent

    metas = [{}, {}, {}]
    response = _json.dumps({"classifications": [
        {"cluster": "0", "category": "Car", "confidence": "0.9"},
        {"cluster": 1, "category": 7, "confidence": None},
        {"cluster": 2.0, "category": "  truck ", "confidence": 0.8},
    ]})
    out = LiDARAgent._parse_classifications(response, metas)
    assert out == [
        {"category": "car", "confidence": 0.9},       # str cluster "0" matches
        {"category": "unknown", "confidence": 0.5},   # int category rejected
        {"category": "truck", "confidence": 0.8},     # float cluster id matches
    ]
    # every category must be a str and every confidence a float
    assert all(isinstance(c["category"], str)
               and isinstance(c["confidence"], float) for c in out)


def test_classify_hints_flag_adds_consistent_geometry_hint():
    """With LiDARConfig.classify_hints the classify prompt carries a
    host-computed 'Geometry suggests:' line per cluster, computed by the
    SAME rule the analytic teacher answers with — so the hint always
    matches the distillation target.  Off by default (checkpoints
    trained without hints must see unchanged prompts)."""
    import json as _json

    import numpy as np

    from msc_tpu.agents.lidar import LiDARAgent
    from msc_tpu.config import LiDARConfig
    from msc_tpu.serving.analytic import AnalyticBackend

    metas = [{"index": 0, "center": np.array([5.0, 2.0, -0.5]),
              "dimensions": np.array([4.3, 1.8, 1.6]),
              "distance": 5.4, "direction": "front", "num_points": 840}]

    def build(cfg):
        agent = object.__new__(LiDARAgent)
        agent.cfg = cfg
        return agent._build_classify_call(tile=None, metas=metas)

    off = build(LiDARConfig(classify_hints=False))
    off_text = off["messages"][1]["content"][1]["text"]
    assert "Geometry suggests:" not in off_text

    on = build(LiDARConfig(classify_hints=True))
    on_text = on["messages"][1]["content"][1]["text"]
    assert "Geometry suggests:" in on_text

    # the hint must equal the analytic teacher's classification of the
    # same prompt (consistent hint/target at distillation time)
    teacher = AnalyticBackend()
    resp = _json.loads(teacher.complete(
        on["messages"], temperature=0.0, task="cluster_classify"))
    cat = resp["classifications"][0]["category"]
    assert f"Geometry suggests: {cat} " in on_text


def test_checkpoint_flags_sidecar_sets_classify_hints(tmp_path, monkeypatch):
    """A `<ckpt>.flags` sidecar recording classify_hints=1 must flip the
    pipeline's lidar config when the env doesn't override — a checkpoint
    trained on hint prompts must be served with hint prompts (and one
    without a sidecar must be untouched)."""
    from msc_tpu.config import ModelConfig
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.client import FakeBackend

    monkeypatch.delenv("MSC_CLASSIFY_HINTS", raising=False)
    ckpt = tmp_path / "ck"
    (tmp_path / "ck.flags").write_text("classify_hints=1\n")
    cfg = ModelConfig()
    cfg.vlm_ckpt = str(ckpt)
    pipe = SemanticCaptioningPipeline(cfg, backend=FakeBackend(),
                                      verbose=False)
    assert pipe.lidar_config.classify_hints is True

    cfg2 = ModelConfig()  # no sidecar -> default (off)
    pipe2 = SemanticCaptioningPipeline(cfg2, backend=FakeBackend(),
                                       verbose=False)
    assert pipe2.lidar_config.classify_hints is False

    # explicit env wins over the sidecar
    monkeypatch.setenv("MSC_CLASSIFY_HINTS", "0")
    pipe3 = SemanticCaptioningPipeline(cfg, backend=FakeBackend(),
                                       verbose=False)
    assert pipe3.lidar_config.classify_hints is False


def test_hint_reconcile_overrides_confident_geometry_disagreement():
    """With LiDARConfig.hint_reconcile, a parsed category that disagrees
    with a CONFIDENT geometry rule (>=0.7) is replaced by the rule's
    answer; uncertain rules leave the model's answer alone, and the
    default (off) changes nothing.  This is the classify-output analogue
    of the MQA fact line (r13 decomposition: 93 lidar_only wrong-fact
    failures were captions reporting 0 of objects the rule detects)."""
    import numpy as np

    from msc_tpu.agents.lidar import LiDARAgent
    from msc_tpu.config import LiDARConfig

    car_meta = {"dimensions": np.array([4.3, 1.8, 1.6]),
                "num_points": 840}            # rule: car @ 0.85
    vague_meta = {"dimensions": np.array([7.0, 1.0, 0.5]),
                  "num_points": 40}           # rule: unknown @ 0.5

    # confident rule + disagreement -> rule wins
    out = LiDARAgent._reconcile_with_geometry(
        car_meta, {"category": "pedestrian", "confidence": 0.9})
    assert out == {"category": "car", "confidence": 0.85}

    # confident rule + agreement -> model's record kept (its confidence)
    out = LiDARAgent._reconcile_with_geometry(
        car_meta, {"category": "car", "confidence": 0.6})
    assert out == {"category": "car", "confidence": 0.6}

    # uncertain rule -> vision decides
    out = LiDARAgent._reconcile_with_geometry(
        vague_meta, {"category": "truck", "confidence": 0.7})
    assert out == {"category": "truck", "confidence": 0.7}

    # a confident rule rescues a dropped-by-gate "unknown" model answer
    out = LiDARAgent._reconcile_with_geometry(
        car_meta, {"category": "unknown", "confidence": 0.5})
    assert out == {"category": "car", "confidence": 0.85}

    # default ON since r14c shipped (97.52% with the lever; RESULTS.md
    # round 5); MSC_HINT_RECONCILE=0 opts out for unassisted A/Bs
    assert LiDARConfig().hint_reconcile is True
    import os
    os.environ["MSC_HINT_RECONCILE"] = "0"
    try:
        assert LiDARConfig().hint_reconcile is False
    finally:
        del os.environ["MSC_HINT_RECONCILE"]
