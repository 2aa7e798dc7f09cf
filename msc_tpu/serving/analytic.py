"""Deterministic, LLM-free backend for the ``call_llm`` seam.

Computes every agent response from the information present in the prompt
— exactly the information an LLM would see — with rule-based logic.  This
makes the full 4-layer pipeline + MQA evaluation hermetic (no weights, no
network) while preserving real modality-ablation behavior: object
knowledge only reaches the final caption if some Layer-1 agent actually
put it into its observations.

Information flows through the same text channel the reference uses
(observation strings hand between layers, `src/pipeline.py:142-144`):
Layer-1 agents embed machine-readable marker lines

    OBJECTS_JSON: [{"category": ..., "direction": ..., "distance": ...,
                    "state": ...}, ...]        (scene-graph agent)
    DETECTIONS_JSON: [...]                      (lidar agent)

into their observation prose; this backend preserves the markers through
seed/merge/refine (the VLM backend's prompts instruct the model to keep
all details, same contract) and the structured-caption task parses them
back out.  MQA answers are then computed from the structured caption only
— so camera-only ablations really do lose annotation knowledge, matching
the reference's information topology.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from msc_tpu.eval.synonyms import (
    normalize_camera,
    normalize_object_name,
)
from msc_tpu.serving.client import Backend

OBJ_MARKER = "OBJECTS_JSON:"
DET_MARKER = "DETECTIONS_JSON:"
CAM_MARKER = "CAMERAS_JSON:"


def _user_text(messages: List[dict]) -> str:
    parts = []
    for m in messages:
        c = m.get("content", "")
        if isinstance(c, str):
            parts.append(c)
        else:
            parts.extend(p.get("text", "") for p in c if p.get("type") == "text")
    return "\n".join(parts)


def extract_markers(text: str) -> List[dict]:
    """Collect objects from the marker lines.

    Sensor-fusion rule: annotation-derived OBJECTS_JSON is authoritative;
    LiDAR DETECTIONS_JSON is used when no annotation marker exists;
    camera CAMERAS_JSON (pixel detections) is the last resort — otherwise
    every physical object would be counted once per sensor stream."""
    for marker in (OBJ_MARKER, DET_MARKER, CAM_MARKER):
        out: List[dict] = []
        seen = set()
        for m in re.finditer(re.escape(marker) + r"\s*(\[.*?\])\s*$", text,
                             re.MULTILINE):
            payload = m.group(1)
            if payload in seen:  # same marker surviving multiple layers
                continue
            seen.add(payload)
            try:
                out.extend(json.loads(payload))
            except json.JSONDecodeError:
                continue
        if out:
            return out
    return []


def _detect_mock_objects(image: np.ndarray, stride: int = 2) -> List[dict]:
    """Detect the mock-world's flat-color category boxes in one frame.

    Exact-color connected components per palette entry; range recovered
    from apparent height (the renderer draws h_px = 2400/r, so
    r = 2400/h_px).  Returns [{category, distance}] sorted by distance.
    This is the honest pixels->objects path: no annotation or lidar data
    is consulted.

    Cost control (this runs on the host for every camera frame of every
    scene): the frame is stride-decimated first (flat-color boxes survive
    decimation exactly, heights scale by 1/stride), and the palette match
    uses one packed-int comparison per color instead of a 3-channel
    ``np.all`` — together ~8x cheaper than the naive loop, which measured
    ~2 s/scene in the serving bench."""
    from msc_tpu.data.mqa import CATEGORY_TO_MQA_OBJECT
    from msc_tpu.data.nuscenes import MOCK_RENDER_COLORS

    import cv2

    out: List[dict] = []
    img = np.asarray(image)
    if img.ndim != 3 or img.shape[-1] != 3:
        return out
    if stride > 1:
        img = img[::stride, ::stride]
    packed = (img[..., 0].astype(np.int32) << 16 \
              | img[..., 1].astype(np.int32) << 8
              | img[..., 2].astype(np.int32))
    for cat, color in MOCK_RENDER_COLORS.items():
        code = (int(color[0]) << 16) | (int(color[1]) << 8) | int(color[2])
        mask = packed == code
        if not mask.any():
            continue
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            mask.astype(np.uint8), connectivity=4)
        name = CATEGORY_TO_MQA_OBJECT.get(cat, cat)
        for i in range(1, n):
            x, y, w, h, area = stats[i]
            if area * stride * stride < 150:  # noise floor (full-res px)
                continue
            out.append({"category": name,
                        "distance": round(
                            float(2400.0 / max(h * stride, 6)), 1)})
    return sorted(out, key=lambda d: d["distance"])


def _marker_lines(text: str) -> List[str]:
    """Unique marker lines, last occurrence of each marker kind wins."""
    lines: Dict[str, str] = {}
    for line in text.splitlines():
        s = line.strip()
        if s.startswith((OBJ_MARKER, DET_MARKER, CAM_MARKER)):
            lines[s.split(":")[0]] = s
    return list(lines.values())


# ---------------------------------------------------------------------------
# Geometric cluster classification (rule-based version of the vision
# prompt's own guidelines, `src/agents/content_transform/
# lidar_agent.py:401-447`: "Cars are roughly rectangular, 4-5m long...").
# ---------------------------------------------------------------------------

def classify_cluster_geometry(dims, num_points: int) -> Dict[str, Any]:
    """dims: (dx, dy, dz) bounding-box extents in meters.

    Thresholds account for the ground split (LiDARConfig.ground_z = -1.4
    vs objects resting on z = -1.8): every cluster's measured height sits
    ~0.4 m under the physical height, e.g. a 1.0 m barrier measures
    ~0.6 m.  Rule ORDER matters: barriers (l≈2.5, low) must be tested
    before the two-wheeler band (round-4 confusion-matrix measurement:
    the old ordering sent 14/15 barriers to "bicycle", and bus detection
    was 50% from range fragmentation — see ops/clustering.py
    merge_fragment_clusters)."""
    d = sorted(float(abs(x)) for x in dims[:2])
    w, l = d[0], d[1]
    h = float(abs(dims[2]))
    if l < 0.55 and h < 0.78:
        # cones are 0.8 m physical; ground-cut clusters measure ~0.4
        return {"category": "traffic_cone", "confidence": 0.85}
    if h >= 1.05 and l < 1.0:
        return {"category": "pedestrian", "confidence": 0.85}
    if 2.15 <= l <= 2.9 and w <= 0.75 and h < 0.72:
        # long, narrow, LOW: barrier (2.5 x 0.5 x 1.0 physical); the
        # length floor keeps sparse far bicycles (l<=1.8) out of here
        return {"category": "barrier", "confidence": 0.8}
    if 1.1 <= l <= 2.5 and w <= 1.2 and h < 1.3:
        # two-wheeler band: motorcycles are wider and taller than bicycles
        cat = "motorcycle" if (w > 0.68 or h > 0.92) else "bicycle"
        return {"category": cat, "confidence": 0.7}
    if 3.0 <= l <= 5.6 and 1.2 <= w <= 2.4 and h <= 1.9:
        return {"category": "car", "confidence": 0.85}
    if l > 8.6 and (h > 2.4 or w > 2.6):
        return {"category": "bus", "confidence": 0.8}
    if 5.2 <= l <= 8.6 and h > 1.9:
        return {"category": "truck", "confidence": 0.75}
    # partial-cluster fallbacks (occluded / surviving fragments)
    if l > 8.6:
        return {"category": "bus", "confidence": 0.6}
    if l > 5.6:
        return {"category": "truck", "confidence": 0.5}
    return {"category": "unknown", "confidence": 0.5}


# ---------------------------------------------------------------------------
# MQA answering from a structured caption
# ---------------------------------------------------------------------------

def _question_matches(question: str, caption: Dict):
    """Shared question-vs-caption matching core: parse the question's
    <obj>/<cam> tags and scan caption['objects'] for matching entries.
    Returns (target_obj, target_cam, count, matches) where matches is
    [(distance, direction, (x, y) or None), ...] over ALL objects of the
    asked category (count respects the <cam> restriction)."""
    objs = re.findall(r"<obj>(.*?)</obj>", question, re.IGNORECASE)
    cams = re.findall(r"<cam>(.*?)</cam>", question, re.IGNORECASE)
    target_obj = objs[0].strip() if objs else None
    target_cam = normalize_camera(cams[0]) if cams else None

    count = 0
    matches = []  # (distance, direction, (x, y) or None)
    if caption.get("objects"):
        # no <obj> tag = every object matches: untagged questions ask
        # about the scene total ("how many objects ..."), and since the
        # stripped MQA prompt carries no record lists the fact line must
        # still carry that total (round-3 ADVICE: question_facts returned
        # None here, so the teacher answered <cnt>0</cnt> scene-blind)
        want = normalize_object_name(target_obj) if target_obj else None
        for o in caption.get("objects", []):
            got = normalize_object_name(o.get("category", ""))
            if want is not None and got != want:
                continue
            pos = str(o.get("position", "")).lower().replace("_", " ")
            dist = None
            m = re.search(r"(\d+(?:\.\d+)?)\s*m", pos)
            if m:
                dist = float(m.group(1))
            xy = None
            m = re.search(r"\((-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)\)", pos)
            if m:
                xy = (float(m.group(1)), float(m.group(2)))
            direction = normalize_camera(pos.split(",")[0])
            matches.append((dist if dist is not None else 1e9,
                            direction, xy))
            if target_cam is not None and direction != target_cam:
                continue
            count += 1
    return target_obj, target_cam, count, matches


def marker_objects(full_caption_text: str) -> List[Dict[str, Any]]:
    """Host-exact caption ``objects`` list derived from the HOST-injected
    marker lines (OBJECTS_JSON/DETECTIONS_JSON, utils/markers.py), in the
    exact format the analytic teacher's ``_structure_caption`` emits.

    Round-3 quality diagnosis: the distilled model answers MQA count
    questions by counting the caption's ``objects`` JSON entries (ablation:
    with objects=[1 entry] but a correct "Counts for this question: 2"
    fact line, every checkpoint answers 1).  Under the vlm backend the
    model-generated objects list is lossy (32-item DFA cap, generation
    errors, collapsed duplicates) while the marker lines are exact — so
    the MQA prompt substitutes these host-derived objects, making the
    model's learned count-the-JSON strategy correct at serving time."""
    objects = extract_markers(full_caption_text)
    out: List[Dict[str, Any]] = []
    for o in objects:
        direction = str(o.get("direction", "front")).replace("_", " ")
        pos_str = f"{direction}, {float(o.get('distance', 0.0)):.1f}m"
        xyz = o.get("position")
        if isinstance(xyz, (list, tuple)) and len(xyz) >= 2:
            pos_str += f", at ({float(xyz[0]):.1f}, {float(xyz[1]):.1f})"
        out.append({
            "category": str(o.get("category", "unknown")),
            "position": pos_str,
            "state": str(o.get("state", "stopped")),
            "attributes": [a for a in [o.get("attribute")] if a],
            "visibility": str(o.get("visibility", "high")),
        })
    return out


def question_facts(question: str, caption: Dict) -> Optional[str]:
    """Question-adjacent fact line for the MQA prompt (round-2 VERDICT
    item 1: "question-adjacent tally placement").

    Deterministic retrieval from the caption the model already sees: the
    asked category's count (scene-wide, and per-view when the question
    names a <cam>) plus the nearest match's range/view/coordinates.  The
    numbers are computed by the SAME matching core the analytic teacher
    answers with (`_question_matches`), so distillation reduces the hard
    count_scene/count_camera families (measured 46%/59% when the model
    had to pick the entry out of an 11-class tally line) to copying the
    adjacent fact.  Questions without an <obj> tag get the scene-total
    tally ("N objects in the scene"); returns None only when there are
    no objects to count at all.

    Fact source: the marker lines in caption['full_caption'] when present
    — they are HOST-injected in every backend (utils/markers.py), whereas
    caption['objects'] is model-generated under the vlm backend and may
    be lossy (32-item DFA cap, model errors).  The analytic teacher's
    objects are built from the same markers (_structure_caption), so
    facts and teacher answers agree exactly at distillation time."""
    pseudo = marker_objects(str(caption.get("full_caption", "")))
    if pseudo:
        caption = {"objects": pseudo}
    target_obj, target_cam, count, matches = _question_matches(
        question, caption)
    if facts_version() == "v3":
        v3 = _question_facts_v3(question, target_obj, count, matches)
        if v3 is not None:
            return v3
    if target_obj is None:
        # untagged questions get the scene-total tally ONLY when they are
        # count/existence-shaped ("how many objects ..."); other untagged
        # questions (weather, free-form) carry no fact line
        if not matches or not re.search(
                r"\bhow many\b|\bare there\b|\bis there\b|\bcount\b|"
                r"\bobjects?\b", question, re.IGNORECASE):
            return None
    obj_word = target_obj if target_obj else "objects"
    parts = []
    if target_cam is not None:
        parts.append(f"{count} {obj_word} in {target_cam}")
        parts.append(f"{len(matches)} {obj_word} in the whole scene")
    else:
        parts.append(f"{count} {obj_word} in the scene")
    nearest = min(matches, key=lambda t: t[0], default=None)
    if nearest is not None:
        d, view, xy = nearest
        near = ["nearest"]
        if d < 1e9:
            near.append(f"{d:.1f}m away")
        if view:
            near.append(f"in {view}")
        if xy is not None:
            near.append(f"at ({xy[0]:.1f}, {xy[1]:.1f})")
        parts.append(" ".join(near))
    return "Counts for this question: " + "; ".join(parts) + "."


# ---------------------------------------------------------------------------
# Fact-line format version.  v2 = one "Counts for this question: ..."
# format for every family.  v3 leads distance/location/camera questions
# with the FAMILY'S OWN answer value immediately after the colon —
# the positional motif the distilled student demonstrably learned for
# counts ("first value after the colon") while never forming a
# mid-sentence nearest-payload copy circuit (round-5 probe: 0/9 slot
# copies on fresh training-style prompts, mode-collapsed outputs).
# Prompt-format contract: a checkpoint must be SERVED with the fact
# format it was TRAINED on, so the version rides the `<ckpt>.flags`
# sidecar (pipeline.py) exactly like classify_hints; MSC_FACTS wins
# when set explicitly.
_FACTS_VERSION = os.environ.get("MSC_FACTS", "v2") or "v2"


def facts_version() -> str:
    return _FACTS_VERSION


def set_facts_version(v: str) -> None:
    """Sidecar override hook (pipeline.py); explicit MSC_FACTS wins."""
    global _FACTS_VERSION
    if not os.environ.get("MSC_FACTS"):
        _FACTS_VERSION = v or "v2"


def _question_facts_v3(question: str, target_obj: Optional[str],
                       count: int, matches) -> Optional[str]:
    """v3 fact line for the nearest-payload families; None = fall back
    to the v2 "Counts for this question" line (count/existence keep the
    format their copy circuit formed on).  The absent conditions mirror
    `_format_mqa_answer` exactly so the lead value is "none"/"unknown"
    precisely when the analytic answer takes the absent-form branch."""
    obj_word = target_obj if target_obj else "objects"
    nearest = min(matches, key=lambda t: t[0], default=None)
    tail = f"{count} {obj_word} in the scene"

    def _near_rest(skip: str) -> str:
        d, view, xy = nearest
        bits = []
        if skip != "dst" and d < 1e9:
            bits.append(f"{d:.1f}m away")
        if skip != "cam" and view:
            bits.append(f"in {view}")
        if skip != "loc" and xy is not None:
            bits.append(f"at ({xy[0]:.1f}, {xy[1]:.1f})")
        return ("; nearest " + " ".join(bits)) if bits else ""

    if re.search(r"\bhow far\b|\bdistance\b", question, re.IGNORECASE):
        if nearest is not None and nearest[0] < 1e9:
            return (f"Distance for this question: {nearest[0]:.1f}m; "
                    f"{tail}{_near_rest('dst')}.")
        return f"Distance for this question: none; {tail}."
    if re.search(r"\bwhere is\b|\blocation of\b|\blocated\b", question,
                 re.IGNORECASE):
        if nearest is not None and nearest[2] is not None:
            x, y = nearest[2]
            return (f"Location for this question: ({x:.1f}, {y:.1f}); "
                    f"{tail}{_near_rest('loc')}.")
        return f"Location for this question: unknown; {tail}."
    if re.search(r"\bwhich camera\b|\bwhich view\b", question,
                 re.IGNORECASE):
        if nearest is not None and nearest[1]:
            return (f"Camera for this question: {nearest[1]}; "
                    f"{tail}{_near_rest('cam')}.")
        return f"Camera for this question: none; {tail}."
    return None


def _format_mqa_answer(question: str, target_obj: Optional[str], count: int,
                       nearest: Optional[tuple]) -> str:
    """Shared nuScenes-MQA XML answer templates (`src/agents/
    structure_caption/caption_agent.py:127-148`): every family is a
    function of (count, nearest (distance, view, xy)) for the asked
    category — exactly the payload of the question-adjacent fact line."""
    obj_word = target_obj if target_obj else "object"

    # distance questions answer with the nearest matching object's range
    if re.search(r"\bhow far\b|\bdistance\b", question, re.IGNORECASE):
        if nearest is not None and nearest[0] < 1e9:
            return (f"The nearest <obj>{obj_word}</obj> is "
                    f"<dst>{nearest[0]:.1f}m</dst> away.")
        return (f"There is no <obj>{obj_word}</obj> visible to measure "
                "a distance to.")

    # location questions answer with ego-frame coordinates (<loc> family,
    # answerable because caption positions carry "(x, y)" suffixes)
    if re.search(r"\bwhere is\b|\blocation of\b|\blocated\b", question,
                 re.IGNORECASE):
        if nearest is not None and nearest[2] is not None:
            x, y = nearest[2]
            return (f"The nearest <obj>{obj_word}</obj> is at "
                    f"<loc>({x:.1f}, {y:.1f})</loc>.")
        return f"The location of the <obj>{obj_word}</obj> is unknown."

    # which-camera questions answer with the nearest match's view (<cam>)
    if re.search(r"\bwhich camera\b|\bwhich view\b", question,
                 re.IGNORECASE):
        if nearest is not None and nearest[1]:
            return (f"The <obj>{obj_word}</obj> appears in the "
                    f"<cam>{nearest[1]}</cam> camera.")
        return f"No camera shows a <obj>{obj_word}</obj>."

    obj_word = target_obj if target_obj else "objects"
    # count/existence answers echo the PLURAL form: the MQA ground truth
    # (data/mqa.py:113-150) and the template automaton
    # (agents/caption.py mqa_response_format) both pluralize the echo
    # even when the question's tag is singular ("Is there a <obj>car
    # </obj>" -> "<obj>cars</obj>").  The scorer normalizes plurals, so
    # scores are unchanged — but training targets must be byte-exact
    # template-admissible (canonicalize_for_dfa validates this).
    if not obj_word.endswith("s"):
        obj_word += "s"
    target = f"<target><cnt>{count}</cnt> <obj>{obj_word}</obj></target>"
    if re.search(r"\bis there\b|\bare there any\b", question, re.IGNORECASE):
        yn = "yes" if count > 0 else "no"
        return f"<ans>{yn}</ans>, there are {target}."
    return f"There are {target}."


def answer_mqa_from_caption(question: str, caption: Dict) -> str:
    """Count/existence answering over caption['objects'], emitting the
    nuScenes-MQA XML contract (`src/agents/structure_caption/
    caption_agent.py:127-148`)."""
    target_obj, target_cam, count, matches = _question_matches(
        question, caption)
    nearest = min(matches, key=lambda t: t[0], default=None)
    return _format_mqa_answer(question, target_obj, count, nearest)


def answer_mqa_from_facts(question: str, facts: str) -> Optional[str]:
    """Answer from the question-adjacent fact line alone (the inverse of
    ``question_facts``) — the deterministic-retrieval path the MQA prompt
    asks the model to perform.  Since round 3 the MQA prompt carries NO
    raw record lists (build_mqa_messages strips them — the model counts
    records at only ~50-60% at scene scale), so the teacher must answer
    from the same fact line the student reads.  Returns None when the
    line doesn't parse (caller falls back to the caption-objects path)."""
    m = re.match(r"Counts for this question:\s*(.+?)\.?\s*$", facts.strip())
    if not m:
        return None
    body = m.group(1)
    target_obj = None
    count = None
    d = view = xy = None
    for part in body.split("; "):
        part = part.strip()
        nm = re.match(r"(\d+)\s+(.+?)\s+in\s+(.+)$", part)
        if nm and count is None:
            # first clause: in-<cam> count for camera-scoped questions,
            # scene count otherwise (question_facts emits it first)
            count = int(nm.group(1))
            target_obj = nm.group(2)
            continue
        if part.startswith("nearest"):
            dm = re.search(r"(\d+(?:\.\d+)?)m away", part)
            if dm:
                d = float(dm.group(1))
            vm = re.search(r"in ([a-z ]+?)(?: at|$)", part)
            if vm:
                view = vm.group(1).strip()
            xm = re.search(r"at \((-?\d+(?:\.\d+)?), (-?\d+(?:\.\d+)?)\)", part)
            if xm:
                xy = (float(xm.group(1)), float(xm.group(2)))
    if count is None:
        return None
    nearest = (d if d is not None else 1e9, view, xy) \
        if (d is not None or view is not None or xy is not None) else None
    return _format_mqa_answer(question, target_obj, count, nearest)


# ---------------------------------------------------------------------------
# The backend
# ---------------------------------------------------------------------------

class AnalyticBackend(Backend):
    """Rule-based completion engine dispatching on the ``task`` hint."""

    def complete(self, messages: List[dict], temperature: float,
                 response_format: Any = None, task: Optional[str] = None,
                 images: Sequence[np.ndarray] = (),
                 max_new_tokens: Optional[int] = None) -> str:
        text = _user_text(messages)
        task = task or ""

        if task == "camera_describe":
            return self._camera(text, images)
        if task == "cluster_classify":
            return self._cluster_classify(text)
        if task == "lidar_interpret":
            return self._lidar_interpret(text)
        if task == "scene_graph":
            return self._scene_graph(text)
        if task == "crossmodal":
            return self._crossmodal(text)
        if task.startswith("seed:"):
            return self._seed(task.split(":", 1)[1], text)
        if task == "merge":
            return self._merge(text)
        if task == "suggest":
            return self._suggest(text)
        if task == "edit":
            return self._edit(text)
        if task == "refine_step":
            return self._refine_step(text)
        if task == "structure_caption":
            return self._structure_caption(text)
        if task == "mqa_answer":
            return self._mqa(text)
        if task == "baseline_caption":
            return self._baseline_caption(text)
        if task == "baseline_answer":
            return self._baseline_answer(text)
        # default: echo a compact acknowledgment of the prompt
        return "Scene analysis: " + text[:200]

    # -- task implementations ------------------------------------------
    def _camera(self, text: str, images: Sequence[np.ndarray] = ()) -> str:
        """Per-view description grounded in the PIXELS: detect the mock
        world's flat-color category boxes (connected components per
        palette color), estimate range from apparent height, and emit a
        CAMERAS_JSON marker so camera-only ablations carry real object
        knowledge downstream (round-1 VERDICT item 7; the reference's
        camera agent gets this from GPT-4o vision,
        `src/agents/content_transform/camera_agent.py:17-37`)."""
        cams = re.findall(r"Camera:\s*(\S+)", text)
        if not cams:
            cams = ["CAM_FRONT"]
        detections = []
        sections = []
        for i, c in enumerate(cams):
            found = (_detect_mock_objects(images[i])
                     if i < len(images) else [])
            direction = c.lower().removeprefix("cam_").replace("_", " ")
            if found:
                parts = []
                for d in found:
                    parts.append(f"a {d['category']} at ~{d['distance']:.0f}m")
                    detections.append({**d, "direction": direction})
                sections.append(f"{c}: The view shows " + ", ".join(parts)
                                + ".")
            else:
                sections.append(f"{c}: The view shows open road with no "
                                "confidently detected objects.")
        out = "\n\n".join(sections)
        if detections:
            out += f"\n{CAM_MARKER} {json.dumps(detections)}"
        return out

    def _cluster_classify(self, text: str) -> str:
        pat = re.compile(
            r"Cluster #(\d+):.*?Size:\s*([\d.]+)\s*x\s*([\d.]+)\s*x\s*([\d.]+)m"
            r".*?Points:\s*(\d+)", re.DOTALL)
        classifications = []
        for m in pat.finditer(text):
            idx = int(m.group(1))
            dims = (float(m.group(2)), float(m.group(3)), float(m.group(4)))
            cls = classify_cluster_geometry(dims, int(m.group(5)))
            classifications.append({
                "cluster": idx,
                "category": cls["category"],
                "confidence": cls["confidence"],
                "reasoning": f"bbox {dims[0]:.1f}x{dims[1]:.1f}x{dims[2]:.1f}m",
            })
        return json.dumps({"classifications": classifications})

    def _lidar_interpret(self, text: str) -> str:
        total = re.search(r"Total detected objects:\s*(\d+)", text)
        density = re.search(r"Traffic density:\s*(\w+)", text)
        lines = [
            "LiDAR scene interpretation: the point cloud analysis detected "
            f"{total.group(1) if total else 'several'} objects around the "
            f"ego vehicle; traffic density is "
            f"{density.group(1) if density else 'unknown'}.",
        ]
        near = re.search(
            r"Nearest Object:\s*\n\s*- Type:\s*(\w+)\s*\n\s*- Distance:\s*"
            r"([\d.]+)m\s*\n\s*- Direction:\s*(\w+)", text)
        if near:
            lines.append(
                f"The nearest object is a {near.group(1)} at "
                f"{near.group(2)}m to the {near.group(3)}; it is the most "
                f"immediately safety-relevant element.")
        lines.extend(_marker_lines(text))
        return "\n".join(lines)

    def _scene_graph(self, text: str) -> str:
        """Build the full HierarchicalSceneGraph JSON from the object
        details the agent put in the prompt."""
        m = re.search(r"Object details:\s*(\[.*\])", text, re.DOTALL)
        objects = []
        if m:
            try:
                objects = json.loads(m.group(1))
            except json.JSONDecodeError:
                objects = []
        total = re.search(r"Total objects:\s*(\d+)", text)
        total_n = int(total.group(1)) if total else len(objects)

        def scene_obj(o):
            pos = o.get("position", [0, 0, 0])
            return {
                "id": o.get("id", "obj"),
                "category": o.get("category", "unknown"),
                "subcategory": o.get("category", "unknown"),
                "position_x": float(pos[0]), "position_y": float(pos[1]),
                "position_z": float(pos[2]),
                "distance_to_ego": float(o.get("distance", 0.0)),
                "direction": o.get("direction", "front"),
                "state": o.get("state", "stopped"),
                "visibility": o.get("visibility", "high"),
            }

        def pick(pred):
            return [scene_obj(o) for o in objects if pred(o.get("category", ""))]

        vehicles = pick(lambda c: any(k in c for k in ("car", "truck", "bus", "trailer")))
        cyclists = pick(lambda c: "bicycle" in c or "motorcycle" in c)
        peds = pick(lambda c: "pedestrian" in c or "adult" in c or "child" in c)
        barriers = pick(lambda c: "barrier" in c)
        cones = pick(lambda c: "cone" in c)
        constr = pick(lambda c: "construction" in c)

        zones = []
        for zone, lo, hi, d in (("front_close", 0, 10, "front"),
                                ("front_medium", 10, 30, "front"),
                                ("left_close", 0, 10, "left"),
                                ("right_close", 0, 10, "right"),
                                ("back_close", 0, 10, "back")):
            zobjs = [scene_obj(o) for o in objects
                     if o.get("direction") == d and lo <= o.get("distance", 0) < hi]
            zones.append({
                "zone_name": zone, "objects": zobjs,
                "is_clear": len(zobjs) == 0,
                "criticality": "high" if (zobjs and hi <= 10) else "low",
            })

        close = [o for o in objects if o.get("distance", 99) < 10]
        safety = [
            f"{o.get('category', 'object')} at {o.get('distance', 0):.1f}m "
            f"to the {o.get('direction', '?')}" for o in close]
        graph = {
            "scene_summary": (
                f"Driving scene with {total_n} annotated objects: "
                f"{len(vehicles)} vehicles, {len(peds)} pedestrians, "
                f"{len(cyclists)} cyclists."),
            "environment": {"lighting": "day", "weather": "clear",
                            "visibility_overall": "good",
                            "location_type": "urban"},
            "road_structure": {
                "road_type": "urban street",
                "lanes": {"lane_count": 2, "lane_type": "urban",
                          "ego_lane_position": "center",
                          "lane_markings": ["solid white edge lines"]},
                "road_elements": [],
                "surface_condition": "dry",
            },
            "traffic_participants": {"vehicles": vehicles,
                                     "cyclists": cyclists,
                                     "vulnerable_road_users": peds},
            "sidewalk_areas": {"has_sidewalk": False, "pedestrians": [],
                               "static_objects": [], "location": "unknown"},
            "static_infrastructure": {"barriers": barriers,
                                      "traffic_cones": cones,
                                      "construction": constr, "other": []},
            "spatial_zones": zones,
            "safety_critical_elements": safety or ["no objects within 10m"],
            "total_objects": total_n,
        }
        return json.dumps(graph)

    def _crossmodal(self, text: str) -> str:
        lines = ["Cross-modal synthesis: the available sensor streams were "
                 "compared for agreement; complementary observations were "
                 "merged and no blocking contradictions were found."]
        lines.extend(_marker_lines(text))
        return "\n".join(lines)

    def _seed(self, focus: str, text: str) -> str:
        objects = extract_markers(text)
        lines: List[str] = []
        if focus == "objects" and objects:
            descs = [
                f"a {o.get('category', 'object')} about "
                f"{float(o.get('distance', 0.0)):.0f} meters to the "
                f"{o.get('direction', 'front')} ({o.get('state', 'stopped')})"
                for o in objects]
            lines.append("The scene contains " + "; ".join(descs) + ".")
        elif focus == "spatial_relations" and objects:
            near = sorted(objects, key=lambda o: o.get("distance", 99))[:3]
            lines.append(
                "The closest elements are " + ", ".join(
                    f"a {o.get('category')} at "
                    f"{float(o.get('distance', 0)):.0f}m "
                    f"{o.get('direction', '')}" for o in near) + ".")
        elif focus == "dynamics" and objects:
            moving = [o for o in objects if o.get("state") == "moving"]
            lines.append(
                f"{len(moving)} of {len(objects)} tracked objects are "
                "currently moving; the remainder are stationary.")
        elif focus == "safety" and objects:
            close = [o for o in objects if float(o.get("distance", 99)) < 10]
            if close:
                lines.append(
                    "Safety-critical proximity: " + ", ".join(
                        f"{o.get('category')} within 10m to the "
                        f"{o.get('direction')}" for o in close) + ".")
            else:
                lines.append("No objects are within the 10m safety envelope.")
        elif focus == "scene_structure":
            lines.append(
                "The scene is an urban driving environment with a drivable "
                "road surface around the ego vehicle and mixed traffic.")
        if not lines:
            lines.append(
                f"No additional {focus.replace('_', ' ')} information is "
                "available from the current sensor configuration.")
        lines.extend(_marker_lines(text))
        return "\n".join(lines)

    def _merge(self, text: str) -> str:
        # strip the instruction trailer after the last caption section
        m = re.search(r"\n\nCreate a single", text)
        if m:
            text = text[: m.start()]
        # captions appear as "<FOCUS> CAPTION:\n<body>" sections
        sections = re.split(r"\n\n[A-Z_]+ CAPTION:\n", "\n\n" + text)
        body: List[str] = []
        for sec in sections[1:]:
            for line in sec.strip().splitlines():
                s = line.strip()
                if not s or s.startswith((OBJ_MARKER, DET_MARKER,
                                          CAM_MARKER)):
                    continue
                if s not in body:
                    body.append(s)
        out = " ".join(body) if body else "A driving scene."
        markers = _marker_lines(text)
        return "\n".join([out] + markers)

    def _suggest(self, text: str) -> str:
        it = re.search(r"Iteration\s+(\d+)", text)
        iteration = int(it.group(1)) if it else 1
        if iteration <= 1:
            return json.dumps({
                "has_suggestions": True,
                "suggestions": [
                    "State explicit counts for every object category.",
                    "Give distances and directions for all nearby objects.",
                ],
                "reasoning": "First pass: quantitative grounding can be "
                             "tightened.",
            })
        return json.dumps({
            "has_suggestions": False,
            "suggestions": [],
            "reasoning": "The caption is comprehensive; counts, distances "
                         "and directions are explicit.",
        })

    @staticmethod
    def _enrich_caption(caption: str, objects: List[dict]) -> str:
        """The editor's deterministic improvement: explicit per-category
        and per-view count lines appended to the prose (the refined
        caption should let a reader answer count questions without
        re-deriving geometry)."""
        if not objects:
            return caption
        counts: Dict[str, int] = {}
        by_dir: Dict[str, Dict[str, int]] = {}
        for o in objects:
            c = str(o.get("category", "object"))
            counts[c] = counts.get(c, 0) + 1
            d = str(o.get("direction", "front")).replace("_", " ")
            by_dir.setdefault(d, {})
            by_dir[d][c] = by_dir[d].get(c, 0) + 1
        summary = ", ".join(f"{v} {k}{'s' if v != 1 else ''}"
                            for k, v in sorted(counts.items()))
        caption = caption + f"\nIn total the scene contains {summary}."
        dir_lines = "; ".join(
            f"{d}: " + ", ".join(f"{v} {k}{'s' if v != 1 else ''}"
                                 for k, v in sorted(cs.items()))
            for d, cs in sorted(by_dir.items()))
        return caption + f"\nBy view - {dir_lines}."

    def _edit(self, text: str) -> str:
        m = re.search(r"Current Caption:\s*\n(.*?)\n\s*Suggestions:", text,
                      re.DOTALL)
        caption = m.group(1).strip() if m else text[:500]
        caption = self._enrich_caption(caption, extract_markers(text))
        return json.dumps({
            "caption": caption,
            "changes_made": ["Added explicit per-category object counts.",
                             "Added per-camera-view count breakdown."],
        })

    def _refine_step(self, text: str) -> str:
        """Fused suggest+edit (RefineStepResponse): iteration 1 critiques
        and applies the count-grounding edits in one response; later
        iterations converge with an empty caption (the controller keeps
        the previous one)."""
        it = re.search(r"Iteration\s+(\d+)", text)
        iteration = int(it.group(1)) if it else 1
        if iteration > 1:
            return json.dumps({
                "has_suggestions": False,
                "suggestions": [],
                "reasoning": "The caption is comprehensive; counts, "
                             "distances and directions are explicit.",
                "caption": "",
                "changes_made": [],
            })
        m = re.search(r"Current Caption:\s*\n(.*?)\n\s*To refine", text,
                      re.DOTALL)
        caption = m.group(1).strip() if m else text[:500]
        caption = self._enrich_caption(caption, extract_markers(text))
        return json.dumps({
            "has_suggestions": True,
            "suggestions": [
                "State explicit counts for every object category.",
                "Give distances and directions for all nearby objects.",
            ],
            "reasoning": "First pass: quantitative grounding can be "
                         "tightened.",
            "caption": caption,
            "changes_made": ["Added explicit per-category object counts.",
                             "Added per-camera-view count breakdown."],
        })

    def _structure_caption(self, text: str) -> str:
        objects = extract_markers(text)
        # position carries direction, range AND ego-frame coordinates:
        # the coordinate suffix is what makes <loc> questions
        # answerable from the caption alone (round-1 VERDICT item 7);
        # the field stays the reference's free-form string
        # (`caption_agent.py:30` "Relative position ...")
        caption_objects = marker_objects(text)
        counts: Dict[str, int] = {}
        for o in caption_objects:
            counts[o["category"]] = counts.get(o["category"], 0) + 1
        summary = (", ".join(f"{v} {k}(s)" for k, v in sorted(counts.items()))
                   or "no confirmed objects")
        close = [o for o in objects if float(o.get("distance", 99)) < 10]
        caption = {
            "scene_summary": f"Urban driving scene containing {summary}.",
            "ego_vehicle": {"action": "driving", "lane_position": "center",
                            "speed_estimate": "moderate"},
            "objects": caption_objects,
            "road_structure": {"type": "urban street", "lanes": "2 lanes",
                               "markings": ["edge lines"]},
            "environment": {"lighting": "day", "weather": "clear",
                            "location_type": "urban"},
            "safety_critical": [
                f"{o.get('category')} at {float(o.get('distance', 0)):.1f}m "
                f"{str(o.get('direction', '')).replace('_', ' ')}"
                for o in close] or ["no objects within 10m"],
        }
        return json.dumps(caption)

    def _baseline_caption(self, text: str) -> str:
        """Prose caption from the stats the baseline prompt carries; the
        per-region annotation count lines are restated verbatim so the
        caption-only answering step has the same information an LLM's
        caption would."""
        lines = ["A driving scene captured by the surround cameras."]
        lidar = re.search(r"LiDAR statistics: .*", text)
        if lidar:
            lines.append(lidar.group(0))
        counts = re.findall(r"- (\d+) ([a-z ]+?) in (front left|front right|"
                            r"back left|back right|front|back)", text)
        for cnt, name, region in counts:
            plural = name if name.endswith("s") or int(cnt) == 1 else name + "s"
            lines.append(f"There are {cnt} {plural} in the {region}.")
        return "\n".join(lines)

    def _baseline_answer(self, text: str) -> str:
        """Answer a question from the prose caption's count sentences."""
        q = re.search(r"Question:\s*(.+)", text)
        question = q.group(1).strip() if q else text
        cap = re.search(r"Scene caption:\s*\n(.*?)\n\nProvide", text, re.DOTALL)
        caption = cap.group(1) if cap else text
        objs = re.findall(r"<obj>(.*?)</obj>", question, re.IGNORECASE)
        cams = re.findall(r"<cam>(.*?)</cam>", question, re.IGNORECASE)
        target_obj = objs[0].strip() if objs else None
        target_cam = normalize_camera(cams[0]) if cams else None

        count = 0
        if target_obj is not None:
            want = normalize_object_name(target_obj)
            for m in re.finditer(r"There are (\d+) ([a-z ]+?) in the "
                                 r"(front left|front right|back left|"
                                 r"back right|front|back)\.", caption):
                if normalize_object_name(m.group(2)) != want:
                    continue
                if target_cam is not None and m.group(3) != target_cam:
                    continue
                count += int(m.group(1))
        obj_word = target_obj if target_obj else "objects"
        target = f"<target><cnt>{count}</cnt> <obj>{obj_word}</obj></target>"
        if re.search(r"\bis there\b|\bare there any\b", question,
                     re.IGNORECASE):
            yn = "yes" if count > 0 else "no"
            return f"<ans>{yn}</ans>, there are {target}."
        return f"There are {target}."

    def _mqa(self, text: str) -> str:
        q = re.search(r"Question:\s*(.+)", text)
        question = q.group(1).strip() if q else text
        # facts-first: the MQA prompt's record lists are stripped (the
        # fact line is the authoritative retrieval payload); the caption
        # parse remains for prompts without one (no-<obj> questions)
        f = re.search(r"Counts for this question:[^\n]*", text)
        if f:
            ans = answer_mqa_from_facts(question, f.group(0))
            if ans is not None:
                return ans
        m = re.search(r"Scene Information:\s*(\{.*\})", text, re.DOTALL)
        caption = {}
        if m:
            try:
                caption = json.loads(m.group(1))
            except json.JSONDecodeError:
                caption = {}
        return answer_mqa_from_caption(question, caption)
