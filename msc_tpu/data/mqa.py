"""nuScenes-MQA dataset access + synthetic MQA generation.

The reference consumes ``data/nuscenes-mqa/df_train_mqa.csv`` with columns
``sample_token, question, answer, question_type``
(`src/evaluation_framework.py:31-35,501-517`).  ``load_mqa_csv`` reads that
format; ``generate_mock_mqa`` synthesizes a consistent MQA dataframe from
the mock loader's annotations so the full evaluation stack runs — and can
be *scored* — hermetically.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

# Maps nuScenes category names to the MQA object vocabulary used by the
# evaluator's synonym table (`src/evaluation_framework.py:38-50`).
CATEGORY_TO_MQA_OBJECT = {
    "vehicle.car": "car",
    "vehicle.truck": "truck",
    "vehicle.bus.rigid": "bus",
    "vehicle.bus.bendy": "bus",
    "vehicle.trailer": "trailer",
    "vehicle.bicycle": "bicycle",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.construction": "construction vehicle",
    "human.pedestrian.adult": "adult pedestrian",
    "human.pedestrian.child": "child pedestrian",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic cone",
}

# Camera channel -> MQA <cam> direction word, consistent with the
# evaluator's camera synonym table (`src/evaluation_framework.py:53-60`).
CHANNEL_TO_CAM = {
    "CAM_FRONT": "front",
    "CAM_FRONT_LEFT": "front left",
    "CAM_FRONT_RIGHT": "front right",
    "CAM_BACK": "back",
    "CAM_BACK_LEFT": "back left",
    "CAM_BACK_RIGHT": "back right",
}


def load_mqa_csv(path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    required = {"sample_token", "question", "answer", "question_type"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"MQA csv missing columns: {sorted(missing)}")
    return df


def camera_sextant(translation: List[float]) -> str:
    """Map an object's (x, y) to the camera sextant covering it.

    Uses the ego-centric convention of the mock scenes: +x forward,
    +y left.  Six 60-degree sextants centered on the camera axes.
    """
    x, y = translation[0], translation[1]
    ang = np.degrees(np.arctan2(y, x)) % 360.0
    if ang < 30 or ang >= 330:
        return "front"
    if ang < 90:
        return "front left"
    if ang < 150:
        return "back left"
    if ang < 210:
        return "back"
    if ang < 270:
        return "back right"
    return "front right"


def count_objects(annotations: List[Dict], obj: Optional[str] = None,
                  cam: Optional[str] = None) -> Dict[str, int]:
    """Ground-truth object counts, optionally restricted to one camera
    sextant.  Returns {mqa_object_name: count}."""
    counts: Dict[str, int] = {}
    for ann in annotations:
        name = CATEGORY_TO_MQA_OBJECT.get(ann["category_name"])
        if name is None:
            continue
        if cam is not None and camera_sextant(ann["translation"]) != cam:
            continue
        counts[name] = counts.get(name, 0) + 1
    if obj is not None:
        return {obj: counts.get(obj, 0)}
    return counts


def generate_mock_mqa(loader, num_scenes: int = 2,
                      samples_per_scene: int = 1) -> pd.DataFrame:
    """Generate an MQA dataframe whose answers are ground truth for the
    mock loader's synthetic scenes.

    Question types mirror the nuScenes-MQA families the evaluator scores
    (count / existence per camera and scene-wide)."""
    rows = []
    scenes = loader.get_scene_list()[:num_scenes]
    for scene in scenes:
        samples = loader.load_scene_samples(scene["token"], max_samples=samples_per_scene)
        for sample in samples:
            token = sample["sample_token"]
            anns = sample["annotations"]
            total = count_objects(anns)
            # Scene-wide count questions for every present category (plus
            # one absent category for the zero-count case).
            asked = set()
            for obj, cnt in sorted(total.items()):
                plural = obj if obj.endswith("s") else obj + "s"
                rows.append({
                    "sample_token": token,
                    "question": f"How many <obj>{plural}</obj> are in the scene?",
                    "answer": f"There are <target><cnt>{cnt}</cnt> <obj>{plural}</obj></target>.",
                    "question_type": "count_scene",
                })
                asked.add(obj)
            for absent in ("bus", "trailer", "motorcycle"):
                if absent not in asked:
                    rows.append({
                        "sample_token": token,
                        "question": f"How many <obj>{absent}s</obj> are in the scene?",
                        "answer": f"There are <target><cnt>0</cnt> <obj>{absent}s</obj></target>.",
                        "question_type": "count_scene",
                    })
                    break
            # Per-camera count + existence questions.
            for cam in ("front", "back", "front left", "back right"):
                per_cam = count_objects(anns, cam=cam)
                for obj in sorted(total):
                    cnt = per_cam.get(obj, 0)
                    plural = obj if obj.endswith("s") else obj + "s"
                    rows.append({
                        "sample_token": token,
                        "question": (f"How many <obj>{plural}</obj> are in "
                                     f"<cam>{cam}</cam>?"),
                        "answer": (f"There are <target><cnt>{cnt}</cnt> "
                                   f"<obj>{plural}</obj></target>."),
                        "question_type": "count_camera",
                    })
                    yn = "yes" if cnt > 0 else "no"
                    rows.append({
                        "sample_token": token,
                        "question": (f"Is there a <obj>{obj}</obj> in "
                                     f"<cam>{cam}</cam>?"),
                        "answer": (f"<ans>{yn}</ans>, there are <target><cnt>{cnt}"
                                   f"</cnt> <obj>{plural}</obj></target>."),
                        "question_type": "existence_camera",
                    })
                    break  # one object per camera keeps the set compact
            # distance question for the nearest object of one category
            # (exercises the <dst> tag paths; the evaluator scores distance
            # questions by their <target> content, parity with the
            # reference's object-only compare)
            if total:
                obj = sorted(total)[0]
                cands = [a for a in anns
                         if CATEGORY_TO_MQA_OBJECT.get(a["category_name"]) == obj]
                dists = [float(np.hypot(a["translation"][0],
                                        a["translation"][1]))
                         for a in cands]
                rows.append({
                    "sample_token": token,
                    "question": (f"How far away is the nearest "
                                 f"<obj>{obj}</obj>?"),
                    "answer": (f"The nearest <obj>{obj}</obj> is "
                               f"<dst>{min(dists):.1f}m</dst> away."),
                    "question_type": "distance",
                })
                # <loc> family: coordinates of the nearest such object
                near = cands[int(np.argmin(dists))]
                x, y = near["translation"][0], near["translation"][1]
                rows.append({
                    "sample_token": token,
                    "question": f"Where is the nearest <obj>{obj}</obj>?",
                    "answer": (f"The nearest <obj>{obj}</obj> is at "
                               f"<loc>({x:.1f}, {y:.1f})</loc>."),
                    "question_type": "location",
                })
                # <cam> family: which view shows it
                rows.append({
                    "sample_token": token,
                    "question": (f"Which camera shows the nearest "
                                 f"<obj>{obj}</obj>?"),
                    "answer": (f"The <obj>{obj}</obj> appears in the "
                               f"<cam>{camera_sextant(near['translation'])}"
                               f"</cam> camera."),
                    "question_type": "camera",
                })
    return pd.DataFrame(rows)


# backwards-compat alias
_cam_of = camera_sextant
