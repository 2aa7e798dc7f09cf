"""nuScenes data layer.

Reproduces the sample-dict contract of the reference loader
(`src/nuscenes_loader.py:56-101`): each sample is a plain dict with keys

    sample_token, timestamp, scene_description, scene_name,
    images            -- list of (900, 1600, 3) uint8 arrays
    camera_names      -- list of channel strings (see CAMERA_CHANNELS order)
    point_cloud       -- (N, 4) float32 [x, y, z, intensity]
    annotations       -- list of annotation dicts (translation in global
                         frame, size [w, l, h], rotation quaternion,
                         velocity [vx, vy], attributes, visibility, ...)
    metadata          -- {location, nbr_objects}

Camera channel order matches `src/nuscenes_loader.py:34-41` exactly
(index 1 is CAM_FRONT_RIGHT — the comment at `src/mock_test.py:13`
claiming otherwise is a reference bug we do not reproduce).

Unlike the reference mock (`src/nuscenes_loader.py:210-298`, pure
``np.random`` with 2 canned annotations), ``MockNuScenesLoader`` here is
deterministic per sample token and generates *structured* scenes: a ground
plane, LiDAR point clusters placed at the annotated object positions, and
smooth synthetic camera images.  This makes the whole pipeline — kernels,
clustering, BEV, agents, MQA scoring — testable end to end with known
ground truth and no dataset.  Set ``legacy_random=True`` for the
reference-style unstructured randn cloud.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

try:  # Optional; real-dataset path only.
    from nuscenes.nuscenes import NuScenes  # type: ignore

    NUSCENES_AVAILABLE = True
except Exception:  # pragma: no cover - devkit not installed in CI image
    NUSCENES_AVAILABLE = False

from msc_tpu.data import lidar_io

# Canonical camera channel order (reference `src/nuscenes_loader.py:34-41`).
CAMERA_CHANNELS: List[str] = [
    "CAM_FRONT",
    "CAM_FRONT_RIGHT",
    "CAM_FRONT_LEFT",
    "CAM_BACK",
    "CAM_BACK_LEFT",
    "CAM_BACK_RIGHT",
]

IMAGE_SHAPE: Tuple[int, int, int] = (900, 1600, 3)


class NuScenesLoader:
    """Real-dataset loader (requires nuscenes-devkit + data on disk).

    Behavior parity with reference `src/nuscenes_loader.py:15-207`.
    """

    def __init__(self, dataroot: str, version: str = "v1.0-mini",
                 ego_frame: bool = False):
        self.dataroot = Path(dataroot)
        self.version = version
        self.ego_frame = ego_frame
        if NUSCENES_AVAILABLE:
            self.nusc = NuScenes(version=version, dataroot=str(dataroot),
                                 verbose=False)
        else:
            # devkit-free table reader (same API subset) — real-data
            # ingestion works, and is hermetically testable, without the
            # nuscenes-devkit dependency stack
            from msc_tpu.data.mini_nuscenes import MiniNuScenes

            self.nusc = MiniNuScenes(version=version, dataroot=str(dataroot))
        self.camera_channels = list(CAMERA_CHANNELS)

    # -- scene index ------------------------------------------------------
    def get_scene_list(self) -> List[Dict]:
        return [
            {
                "token": s["token"],
                "name": s["name"],
                "description": s["description"],
                "nbr_samples": s["nbr_samples"],
                "first_sample_token": s["first_sample_token"],
            }
            for s in self.nusc.scene
        ]

    # -- sample loading ---------------------------------------------------
    def load_sample(self, sample_token: str) -> Dict:
        sample = self.nusc.get("sample", sample_token)

        images, camera_names = [], []
        for channel in self.camera_channels:
            if channel in sample["data"]:
                img, name = self._load_camera(sample["data"][channel])
                images.append(img)
                camera_names.append(name)

        point_cloud = self._load_lidar(sample["data"]["LIDAR_TOP"])
        annotations = self._load_annotations(sample["anns"], sample)
        scene = self.nusc.get("scene", sample["scene_token"])

        return {
            "sample_token": sample_token,
            "timestamp": sample["timestamp"],
            "scene_description": scene["description"],
            "scene_name": scene["name"],
            "images": images,
            "camera_names": camera_names,
            "point_cloud": point_cloud,
            "annotations": annotations,
            "metadata": {
                "location": self.nusc.get("log", scene["log_token"])["location"],
                "nbr_objects": len(annotations),
            },
        }

    def load_scene_samples(self, scene_token: str,
                           max_samples: Optional[int] = None) -> List[Dict]:
        scene = self.nusc.get("scene", scene_token)
        token = scene["first_sample_token"]
        out: List[Dict] = []
        while token:
            if max_samples is not None and len(out) >= max_samples:
                break
            out.append(self.load_sample(token))
            token = self.nusc.get("sample", token)["next"]
        return out

    def get_sample_by_scene_index(self, scene_idx: int, sample_idx: int = 0) -> Optional[Dict]:
        scene = self.nusc.scene[scene_idx]
        samples = self.load_scene_samples(scene["token"], max_samples=sample_idx + 1)
        return samples[sample_idx] if samples else None

    # -- private ----------------------------------------------------------
    def _load_camera(self, cam_token: str):
        # native libjpeg decode (threaded C++ path with PIL fallback,
        # SURVEY.md section 2.2 row 1) replaces PIL's per-frame decode
        from msc_tpu.data.image_io import decode_jpeg

        cam_data = self.nusc.get("sample_data", cam_token)
        img = decode_jpeg(str(self.dataroot / cam_data["filename"]))
        return img, cam_data["channel"]

    def _load_lidar(self, lidar_token: str) -> np.ndarray:
        lidar_data = self.nusc.get("sample_data", lidar_token)
        path = self.dataroot / lidar_data["filename"]
        # Native mmap .bin reader (C++ fast path with numpy fallback),
        # replacing the devkit's LidarPointCloud.from_file
        # (reference `src/nuscenes_loader.py:146-157`).
        return lidar_io.read_lidar_bin(str(path))

    def _load_annotations(self, ann_tokens: List[str], sample: Dict) -> List[Dict]:
        ego_T = None
        if self.ego_frame:
            # Correct global->ego transform (reference bug fix; the
            # reference consumes global-frame translations directly,
            # SURVEY.md section 7 step 1).
            sd = self.nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
            ego_pose = self.nusc.get("ego_pose", sd["ego_pose_token"])
            ego_T = (np.asarray(ego_pose["translation"]),
                     np.asarray(ego_pose["rotation"]))

        annotations = []
        for token in ann_tokens:
            ann = self.nusc.get("sample_annotation", token)
            attributes = [
                self.nusc.get("attribute", t)["name"]
                for t in ann["attribute_tokens"]
            ]
            visibility = self.nusc.get("visibility", ann["visibility_token"])
            translation = list(ann["translation"])
            if ego_T is not None:
                translation = _global_to_ego(translation, *ego_T)
            annotations.append({
                "token": token,
                "category_name": ann["category_name"],
                "instance_token": ann["instance_token"],
                "translation": translation,
                "size": ann["size"],
                "rotation": ann["rotation"],
                "velocity": list(np.asarray(self.nusc.box_velocity(token))[:2]),
                "attribute_tokens": attributes,
                "visibility_token": visibility["description"],
                "num_lidar_pts": ann["num_lidar_pts"],
                "num_radar_pts": ann["num_radar_pts"],
            })
        return annotations


def _global_to_ego(translation, ego_t, ego_q):
    """Transform a global-frame point into the ego frame (yaw-only inverse)."""
    w, x, y, z = ego_q
    # quaternion -> rotation matrix (row-major, active rotation)
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    p = np.asarray(translation, dtype=np.float64) - np.asarray(ego_t, dtype=np.float64)
    return list(R.T @ p)


# ---------------------------------------------------------------------------
# Mock loader
# ---------------------------------------------------------------------------

# Categories available in the synthetic scene generator, with (w, l, h) size
# priors and the LiDAR point budget per object.
_MOCK_CATEGORIES = [
    ("vehicle.car", (2.0, 4.5, 1.6), 400),
    ("vehicle.truck", (2.5, 7.0, 3.0), 700),
    ("vehicle.bus.rigid", (2.9, 11.0, 3.4), 900),
    ("human.pedestrian.adult", (0.6, 0.6, 1.75), 90),
    ("vehicle.bicycle", (0.6, 1.8, 1.2), 60),
    ("vehicle.motorcycle", (0.8, 2.1, 1.4), 80),
    ("movable_object.barrier", (0.5, 2.5, 1.0), 120),
    ("movable_object.trafficcone", (0.4, 0.4, 0.8), 30),
]

# Flat render colors for the mock-world's "appearance model": annotations
# draw as these exact RGB rectangles in their sextant's camera image, and
# the analytic camera backend detects them from pixels alone
# (`msc_tpu/serving/analytic.py` camera_describe).  Values are chosen to
# be unambiguous against the sky->road gradient background.
MOCK_RENDER_COLORS = {
    "vehicle.car": (220, 30, 30),
    "vehicle.truck": (30, 80, 220),
    "vehicle.bus.rigid": (240, 180, 20),
    "human.pedestrian.adult": (30, 200, 60),
    "vehicle.bicycle": (200, 40, 200),
    "vehicle.motorcycle": (20, 210, 210),
    "movable_object.barrier": (250, 120, 30),
    "movable_object.trafficcone": (250, 240, 90),
}

_MOCK_ATTR = {
    "vehicle.car": "vehicle.moving",
    "vehicle.truck": "vehicle.parked",
    "vehicle.bus.rigid": "vehicle.moving",
    "human.pedestrian.adult": "pedestrian.moving",
    "vehicle.bicycle": "cycle.with_rider",
    "vehicle.motorcycle": "cycle.without_rider",
    "movable_object.barrier": "",
    "movable_object.trafficcone": "",
}


def _token_seed(token: str) -> int:
    return int.from_bytes(hashlib.sha1(token.encode()).digest()[:4], "little")


class MockNuScenesLoader:
    """Deterministic synthetic loader (contract parity with
    `src/nuscenes_loader.py:210-298`).

    Each sample token maps to a fixed synthetic scene: ground-plane LiDAR
    returns at z ~= -1.8 m, per-object point clusters at the annotated
    positions, and smooth gradient camera images.  ``legacy_random=True``
    reproduces the reference's unstructured ``randn(10000, 4)`` cloud.
    """

    def __init__(self, dataroot: Optional[str] = None, version: str = "v1.0-mini",
                 num_scenes: int = 4, samples_per_scene: int = 5,
                 n_points: int = 34000, legacy_random: bool = False,
                 image_shape: Tuple[int, int, int] = IMAGE_SHAPE):
        self.version = version
        self.camera_channels = list(CAMERA_CHANNELS)
        self.num_scenes = num_scenes
        self.samples_per_scene = samples_per_scene
        self.n_points = n_points
        self.legacy_random = legacy_random
        self.image_shape = image_shape

    # -- scene index ------------------------------------------------------
    def get_scene_list(self) -> List[Dict]:
        return [
            {
                "token": f"mock_scene_{i:03d}",
                "name": f"scene-{i:04d}",
                "description": "Synthetic urban intersection with mixed traffic",
                "nbr_samples": self.samples_per_scene,
                "first_sample_token": f"mock_sample_{i:03d}_000",
            }
            for i in range(self.num_scenes)
        ]

    def load_scene_samples(self, scene_token: str,
                           max_samples: Optional[int] = None) -> List[Dict]:
        idx = int(scene_token.split("_")[-1]) if scene_token.split("_")[-1].isdigit() else 0
        n = self.samples_per_scene if max_samples is None else min(max_samples, self.samples_per_scene)
        return [self.load_sample(f"mock_sample_{idx:03d}_{j:03d}") for j in range(n)]

    def get_sample_by_scene_index(self, scene_idx: int, sample_idx: int = 0) -> Dict:
        return self.load_sample(f"mock_sample_{scene_idx:03d}_{sample_idx:03d}")

    # -- sample synthesis --------------------------------------------------
    def load_sample(self, sample_token: str) -> Dict:
        rng = np.random.default_rng(_token_seed(sample_token))

        annotations = self._make_annotations(rng)
        if self.legacy_random:
            point_cloud = rng.standard_normal((10000, 4)).astype(np.float32)
        else:
            point_cloud = self._make_point_cloud(rng, annotations)
        images = [self._make_image(rng, k, annotations) for k in range(6)]

        scene_id = sample_token.split("_")[2] if len(sample_token.split("_")) > 2 else "000"
        return {
            "sample_token": sample_token,
            "timestamp": 1532402927647951,
            "scene_description": "Synthetic urban intersection with mixed traffic",
            "scene_name": f"scene-{int(scene_id):04d}",
            "images": images,
            "camera_names": list(self.camera_channels),
            "point_cloud": point_cloud,
            "annotations": annotations,
            "metadata": {
                "location": "boston-seaport",
                "nbr_objects": len(annotations),
            },
        }

    def _make_annotations(self, rng: np.random.Generator) -> List[Dict]:
        n_objects = int(rng.integers(6, 18))
        annotations = []
        for i in range(n_objects):
            cat, size, _ = _MOCK_CATEGORIES[int(rng.integers(0, len(_MOCK_CATEGORIES)))]
            # Place objects in an annulus 4-40 m from ego, any direction.
            r = float(rng.uniform(4.0, 40.0))
            theta = float(rng.uniform(0.0, 2 * np.pi))
            x, y = r * np.cos(theta), r * np.sin(theta)
            z = size[2] / 2.0 - 1.8  # resting on ground plane at z = -1.8
            moving = "moving" in _MOCK_ATTR.get(cat, "")
            speed = float(rng.uniform(2.0, 8.0)) if moving else 0.0
            heading = float(rng.uniform(0, 2 * np.pi))
            annotations.append({
                "token": f"mock_ann_{i:03d}",
                "category_name": cat,
                "instance_token": f"mock_inst_{i:03d}",
                "translation": [float(x), float(y), float(z)],
                "size": [float(s) for s in size],
                "rotation": [float(np.cos(heading / 2)), 0.0, 0.0, float(np.sin(heading / 2))],
                "velocity": [speed * float(np.cos(heading)), speed * float(np.sin(heading))],
                "attribute_tokens": [_MOCK_ATTR[cat]] if _MOCK_ATTR.get(cat) else [],
                "visibility_token": "80-100% visibility" if r < 20 else "60-80% visibility",
                "num_lidar_pts": int(max(10, 2000 / r)),
                "num_radar_pts": int(rng.integers(0, 8)),
            })
        return annotations

    def _make_point_cloud(self, rng: np.random.Generator,
                          annotations: List[Dict]) -> np.ndarray:
        budgets = []
        size_by_cat = {c: s for c, s, _ in _MOCK_CATEGORIES}
        pts_by_cat = {c: n for c, _, n in _MOCK_CATEGORIES}
        clusters = []
        for ann in annotations:
            cat = ann["category_name"]
            w, l, h = ann["size"]
            cx, cy, cz = ann["translation"]
            dist = max(1.0, float(np.hypot(cx, cy)))
            n = max(60, int(pts_by_cat.get(cat, 200) * min(1.0, 12.0 / dist)))
            # LiDAR-like: sample on the ego-facing box surfaces (two
            # vertical faces + roof) instead of uniformly in the volume,
            # so clusters are dense and connected at eps = 0.5 m.
            face = rng.integers(0, 3, size=n)
            u = rng.uniform(-0.5, 0.5, size=n)
            v = rng.uniform(-0.5, 0.5, size=n)
            pts = np.empty((n, 3), np.float32)
            pts[:, 0] = np.where(face == 0, -0.5, u) * l
            pts[:, 1] = np.where(face == 1, -0.5, np.where(face == 0, u, v)) * w
            pts[:, 2] = np.where(face == 2, 0.5, v) * h
            pts += np.array([cx, cy, cz], np.float32)
            intensity = rng.uniform(0.1, 0.9, size=(n, 1))
            clusters.append(np.hstack([pts, intensity]).astype(np.float32))
            budgets.append(n)

        n_obj = int(sum(budgets))
        n_ground = max(0, self.n_points - n_obj)
        # Ground plane: disc of radius 48 m, z ~ N(-1.8, 0.03).
        r = np.sqrt(rng.uniform(1.0, 1.0 + 48.0 ** 2, size=n_ground))
        th = rng.uniform(0, 2 * np.pi, size=n_ground)
        gx, gy = r * np.cos(th), r * np.sin(th)
        gz = rng.normal(-1.8, 0.03, size=n_ground)
        gi = rng.uniform(0.0, 0.3, size=n_ground)
        ground = np.stack([gx, gy, gz, gi], axis=1).astype(np.float32)

        pc = np.vstack([ground] + clusters) if clusters else ground
        rng.shuffle(pc, axis=0)
        return pc.astype(np.float32)

    def _make_image(self, rng: np.random.Generator, cam_idx: int,
                    annotations: Optional[List[Dict]] = None) -> np.ndarray:
        h, w, _ = self.image_shape
        # Smooth sky->road gradient plus per-camera tint; cheap and
        # deterministic (JPEG-friendly unlike the reference's random noise).
        yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
        base = np.stack([
            140 + 60 * yy + 8 * cam_idx * np.ones((h, w), np.float32),
            160 - 40 * yy * np.ones((h, w), np.float32),
            200 - 120 * yy * np.ones((h, w), np.float32),
        ], axis=-1)
        noise = rng.normal(0, 4, size=(-(-h // 8), -(-w // 8), 3)).astype(np.float32)
        noise = np.kron(noise, np.ones((8, 8, 1), np.float32))[:h, :w]
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        if annotations:
            self._render_annotations(img, cam_idx, annotations)
        return img

    def _render_annotations(self, img: np.ndarray, cam_idx: int,
                            annotations: List[Dict]):
        """Draw each annotation visible in this camera's sextant as a
        flat-color rectangle (color encodes category, size encodes range)
        — the mock-world's 'appearance model'.  This is what makes the
        CAMERA modality carry real scene content: the analytic camera
        backend detects these boxes from pixels alone, so camera-only
        ablations are grounded in the images, not boilerplate (round-1
        VERDICT item 7)."""
        from msc_tpu.data.mqa import CHANNEL_TO_CAM, camera_sextant

        h, w, _ = img.shape
        direction = CHANNEL_TO_CAM[self.camera_channels[cam_idx]]
        drawn: List[tuple] = []
        for ann in sorted(annotations,
                          key=lambda a: -float(np.hypot(a["translation"][0],
                                                        a["translation"][1]))):
            if camera_sextant(ann["translation"]) != direction:
                continue
            color = MOCK_RENDER_COLORS.get(ann["category_name"])
            if color is None:
                continue
            x, y = ann["translation"][0], ann["translation"][1]
            r = max(1.0, float(np.hypot(x, y)))
            box_h = int(np.clip(2400.0 / r, 24, 400))
            box_w = max(12, int(box_h * 0.7))
            # horizontal position from bearing within the 60-degree sextant
            ang = np.degrees(np.arctan2(y, x))
            centers = {"front": 0, "front left": 60, "back left": 120,
                       "back": 180, "back right": 240, "front right": 300}
            rel = ((ang - centers[direction]) + 180) % 360 - 180  # [-30, 30)
            u = 0.5 - (rel / 60.0) * 0.8
            cx = int(np.clip(u * w, box_w // 2 + 2, w - box_w // 2 - 2))
            cy = int(h * 0.52 + h * 0.30 * (1.0 - min(r, 40.0) / 40.0))
            # nudge right until clear of previously drawn boxes (merged
            # blobs would undercount in the detector)
            for _ in range(16):
                x0, x1 = cx - box_w // 2, cx + box_w // 2
                y0, y1 = cy - box_h // 2, cy + box_h // 2
                if all(x1 + 2 < dx0 or x0 - 2 > dx1 or y1 + 2 < dy0
                       or y0 - 2 > dy1 for dx0, dx1, dy0, dy1 in drawn):
                    break
                cx = (cx + box_w + 6) % (w - box_w) + box_w // 2
            x0 = int(np.clip(cx - box_w // 2, 0, w - box_w - 1))
            y0 = int(np.clip(cy - box_h // 2, 0, h - box_h - 1))
            img[y0: y0 + box_h, x0: x0 + box_w] = color
            drawn.append((x0, x0 + box_w, y0, y0 + box_h))


def create_loader(dataroot: Optional[str] = None, version: str = "v1.0-mini",
                  use_mock: bool = False, ego_frame: bool = False):
    """Loader factory (parity with `src/nuscenes_loader.py:301-314`):
    falls back to the mock when the dataroot is missing.  A missing
    devkit no longer forces the mock — the devkit-free MiniNuScenes
    table reader serves real data (msc_tpu/data/mini_nuscenes.py)."""
    if use_mock or dataroot is None or not Path(dataroot).exists():
        return MockNuScenesLoader(dataroot, version)
    return NuScenesLoader(dataroot, version, ego_frame=ego_frame)
