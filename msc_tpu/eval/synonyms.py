"""Shared object/camera synonym tables.

Single source of truth for both the evaluator and the analytic MQA
answerer — the reference keeps its copy inside the evaluator
(`src/evaluation_framework.py:38-60`); SURVEY.md section 5 flags the
resulting duplicated/diverging scoring logic, which this module fixes.
Contents are semantics-parity with the reference tables.
"""

from __future__ import annotations

# Object category -> accepted variants (`evaluation_framework.py:38-50`).
CATEGORY_MAPPINGS = {
    "adult pedestrian": ["pedestrian", "adult", "person", "people",
                         "adult pedestrian"],
    "child pedestrian": ["child", "children"],
    "car": ["car", "vehicle", "automobile"],
    "truck": ["truck", "trucks"],
    "bus": ["bus", "buses"],
    "trailer": ["trailer", "trailers"],
    "bicycle": ["bicycle", "bike", "cyclist", "bicycles"],
    "motorcycle": ["motorcycle", "motorbike", "motorcycles"],
    "barrier": ["barrier", "barriers"],
    "traffic cone": ["traffic cone", "cone", "traffic cones", "cones"],
    "construction vehicle": ["construction", "construction vehicle"],
}

# Camera direction -> accepted variants (`evaluation_framework.py:53-60`).
CAMERA_DIRECTIONS = {
    "front": ["front", "forward"],
    "front left": ["front left", "frontleft", "front_left"],
    "front right": ["front right", "frontright", "front_right"],
    "back": ["back", "rear", "behind"],
    "back left": ["back left", "backleft", "back_left", "rear left"],
    "back right": ["back right", "backright", "back_right", "rear right"],
}


def normalize_object_name(obj_name) -> str:
    """Bidirectional-substring normalization, parity with
    `evaluation_framework.py:169-185`."""
    if not isinstance(obj_name, str):
        obj_name = str(obj_name)
    obj_name = obj_name.lower().strip().replace("_", " ").replace("-", " ")
    for standard, variants in CATEGORY_MAPPINGS.items():
        for variant in variants:
            if variant in obj_name or obj_name in variant:
                return standard
    return obj_name


def normalize_camera(cam) -> str:
    """Map a camera phrase to its canonical direction."""
    if not isinstance(cam, str):
        cam = str(cam)
    cam = cam.lower().strip().replace("_", " ")
    for standard, variants in CAMERA_DIRECTIONS.items():
        if cam == standard or cam in variants:
            return standard
    # substring fallback: longest variants first so "back left" beats "back"
    all_variants = [(v, s) for s, vs in CAMERA_DIRECTIONS.items() for v in vs]
    for variant, standard in sorted(all_variants, key=lambda x: -len(x[0])):
        if variant in cam:
            return standard
    return cam
