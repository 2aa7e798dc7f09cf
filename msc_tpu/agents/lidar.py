"""LiDARAgent: point-cloud perception (Layer 1) — the numeric heavyweight.

Behavior parity with `src/agents/content_transform/lidar_agent.py:30-861`
(7-step pipeline: filter -> ground split -> clustering -> cluster
classification via vision -> multi-layer BEV -> semantic features ->
report + scene interpretation), with the data plane moved onto the TPU:

- filter/ground/BEV/clustering/splatting run as fused XLA programs
  (`msc_tpu/ops/*`) on one padded buffer — the reference's per-point
  Python loops (SURVEY.md section 3.5 hot loops #1-#3) are gone;
- cluster classification batches <=10 clusters per model call with the
  same tiled multi-view image + metadata contract
  (`lidar_agent.py:358-504`);
- clustering backend selectable: "device" (voxel connected components)
  or "host" (exact grid DBSCAN in C++), see `msc_tpu/ops/clustering.py`.

The agent appends a machine-readable ``DETECTIONS_JSON`` marker line to
its observations so detections survive the downstream text-channel layers
(see `msc_tpu/serving/analytic.py` module docstring).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msc_tpu.agents.base import BaseAgent
from msc_tpu.config import LiDARConfig
from msc_tpu.data.mqa import camera_sextant
from msc_tpu.ops import (
    filter_and_segment,
    pad_point_cloud,
    rasterize_bev,
    decorate_semantic_bev,
    render_cluster_views,
)
from msc_tpu.ops.boxgeom import direction_8way_host
from msc_tpu.ops.splat import (
    gather_cluster_points,
    tile_cluster_grids_device,
)
from msc_tpu.serving.analytic import DET_MARKER
from msc_tpu.utils.device_lock import DEVICE_LOCK


def _as_int(v: Any) -> Optional[int]:
    """Model-JSON cluster index as int ("0"/0/0.0 all match row 0)."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


@dataclasses.dataclass
class DetectedObject:
    """A detected object (parity with `lidar_agent.py:18-27`)."""

    category: str
    position: np.ndarray      # [x, y, z]
    dimensions: np.ndarray    # [length, width, height]
    num_points: int
    distance: float
    direction: str
    confidence: float


_CLASSIFY_SYSTEM = """You are an expert in 3D object classification for autonomous driving.

You will see multi-view visualizations of objects detected from LiDAR point clouds. Each object is shown in 4 views: top (XY), side (XZ), front (YZ) and an isometric 3D view.

Classify each object into one of: car, truck, bus, pedestrian, bicycle, motorcycle, trailer, barrier, traffic_cone, construction_vehicle, unknown.

Guidelines:
- Use shape, size, and point density to classify
- Cars are roughly rectangular, 4-5m long, 1.6-2m wide
- Pedestrians are small, vertical, roughly cylindrical
- Trucks/buses are larger versions of cars (>5m)
- Bicycles are thin, elongated (~2m long, <1m wide)
- Consider the metadata (dimensions, point count) as additional context
- If unsure, use 'unknown'

Output format (JSON):
{"classifications": [{"cluster": 0, "category": "car", "confidence": 0.9, "reasoning": "..."}, ...]}

Be precise and provide confidence scores (0.0-1.0). Output valid JSON only."""

_INTERPRET_SYSTEM = """You are an autonomous driving scene understanding expert.

You receive a structured LiDAR analysis report with detected objects and a Bird's Eye View visualization showing object locations (green cross = ego vehicle, distance rings at 10/20/30/40m).

Your task:
- Provide high-level scene interpretation
- Identify potential risks or notable situations
- Describe the overall driving context
- Note any patterns or important spatial relationships

Be concise and focus on actionable insights for autonomous driving."""


class LiDARAgent(BaseAgent):
    """LiDAR processing agent (TPU data plane + model interpretation)."""

    def __init__(self, client, model: str, agent_name: str,
                 lidar_config: Optional[LiDARConfig] = None,
                 cluster_backend: str = "device"):
        super().__init__(client, model, agent_name)
        self.cfg = lidar_config or LiDARConfig()
        self.cluster_backend = cluster_backend
        self.last_bev: Optional[Dict[str, np.ndarray]] = None

    # ------------------------------------------------------------------
    def process(self, point_cloud: np.ndarray,
                context: Optional[Dict] = None) -> Dict[str, Any]:
        """Serial path: the three phases back to back.  The pipeline's
        fused path calls the phases directly so the classify calls can
        batch with OTHER agents' calls (round-2 VERDICT item 3)."""
        state = self.front(point_cloud)
        responses = (self.client.call_llm_batch(state["calls"])
                     if state["calls"] else [])
        state = self.after_classify(state, responses)
        interp = self.call_llm(**self.interpret_call(state, context))
        return self.finish(state, interp)

    def front(self, point_cloud: np.ndarray) -> Dict[str, Any]:
        """Phase 1: the numeric front end (steps 1-4) through cluster
        rendering; returns a state dict whose ``calls`` are the batched
        classify call specs (0..ceil(K/10))."""
        import os
        import sys
        import time

        _dbg = os.environ.get("MSC_ENGINE_DEBUG") == "1"
        _t0 = time.perf_counter()

        def _mark(label):
            nonlocal _t0
            if _dbg:
                now = time.perf_counter()
                print(f"[lidar] {label} {1000 * (now - _t0):.0f}ms",
                      file=sys.stderr)
                _t0 = now

        cfg = self.cfg
        pc_np, n = pad_point_cloud(point_cloud, cfg.max_points)
        pc = jnp.asarray(pc_np)

        # Steps 1-4: ONE fused device dispatch (filter + ground split + BEV
        # + clustering) — every jitted call is a tunnel RPC, so the whole
        # numeric front end runs as a single XLA program.  BEV layers STAY
        # ON DEVICE (the VLM consumes them as device images; host copies
        # only on demand via `generate_bev`/export tools), and one small
        # batched device_get brings back everything host logic needs.
        # Device work serializes through DEVICE_LOCK so concurrent scene
        # threads don't thrash the tunnel.
        if self.cluster_backend == "host":
            with DEVICE_LOCK:
                masks = filter_and_segment(
                    pc, n, min_range=cfg.min_range, max_range=cfg.max_range,
                    min_z=cfg.min_z, max_z=cfg.max_z, ground_z=cfg.ground_z)
                bev = rasterize_bev(pc, masks["ground"], masks["object"],
                                    res=cfg.bev_resolution,
                                    bev_range=cfg.bev_range)
                n_ground = int(masks["n_ground"])
                n_object = int(masks["n_object"])
            self.last_bev = bev
            sem_bev = bev["semantic"]
            clusters = self._cluster_host(pc_np, masks)
        else:
            from msc_tpu.ops.lidar_pass import lidar_device_pass

            with DEVICE_LOCK:
                out = lidar_device_pass(
                    pc, n, min_range=cfg.min_range, max_range=cfg.max_range,
                    min_z=cfg.min_z, max_z=cfg.max_z, ground_z=cfg.ground_z,
                    eps=cfg.dbscan_eps, min_samples=cfg.dbscan_min_samples,
                    min_cluster_points=cfg.min_cluster_points,
                    bev_resolution=cfg.bev_resolution,
                    bev_range=cfg.bev_range, max_clusters=cfg.max_clusters)
                small = jax.device_get({k: out[k] for k in (
                    "n_ground", "n_object", "cl_point_cluster",
                    "cl_cluster_valid")})
            self.last_bev = {"density": out["bev_density"],
                             "height": out["bev_height"],
                             "semantic": out["bev_semantic"]}
            sem_bev = out["bev_semantic"]
            valid = np.asarray(small["cl_cluster_valid"])
            pcl = np.asarray(small["cl_point_cluster"])
            remap = np.full(len(valid) + 1, -1, np.int32)
            remap[np.flatnonzero(valid)] = np.arange(int(valid.sum()))
            point_cluster = np.where(
                pcl >= 0, remap[np.clip(pcl, 0, len(valid))], -1)
            clusters = {"point_cluster": point_cluster.astype(np.int32),
                        "n_clusters": int(valid.sum())}
            n_ground = int(small["n_ground"])
            n_object = int(small["n_object"])

        _mark("front_end")
        # Step 3b dispatch prep: batched classify call specs.
        calls, batch_metas = self._build_classify_calls(pc_np, clusters)
        _mark("classify_prep")
        return {"calls": calls, "batch_metas": batch_metas,
                "sem_bev": sem_bev, "n_ground": n_ground,
                "n_object": n_object}

    def after_classify(self, state: Dict[str, Any],
                       responses: List[str]) -> Dict[str, Any]:
        """Phase 2: consume classify responses -> detected objects,
        semantic features (step 5), structured report (step 6)."""
        detected: List[DetectedObject] = []
        for batch_meta, response in zip(state["batch_metas"], responses):
            classifications = self._parse_classifications(response, batch_meta)
            if self.cfg.hint_reconcile:
                classifications = [
                    self._reconcile_with_geometry(meta, cls)
                    for meta, cls in zip(batch_meta, classifications)]
            for meta, cls in zip(batch_meta, classifications):
                if cls["category"] != "unknown" and cls["confidence"] > 0.3:
                    detected.append(DetectedObject(
                        category=cls["category"],
                        position=meta["center"],
                        dimensions=meta["dimensions"],
                        num_points=meta["num_points"],
                        distance=meta["distance"],
                        direction=meta["direction"],
                        confidence=cls["confidence"],
                    ))
        features = self._semantic_features(detected, state["n_ground"],
                                           state["n_object"])
        report = self._report(features, detected)
        return {**state, "detected": detected, "features": features,
                "report": report}

    def interpret_call(self, state: Dict[str, Any],
                       context: Optional[Dict] = None) -> dict:
        """Phase 3 call spec: model interpretation of report + BEV
        (step 7; device image — cv2 decorations are export cosmetics)."""
        return self._interpret_spec(state["report"], state["sem_bev"],
                                    context)

    def finish(self, state: Dict[str, Any], interpretation: str
               ) -> Dict[str, Any]:
        detected = state["detected"]
        observations = self._append_marker(interpretation, detected)
        return {
            "agent": self.agent_name,
            "modality": "lidar",
            "detected_objects": [self._to_dict(o) for o in detected],
            "semantic_features": state["features"],
            "structured_report": state["report"],
            "observations": observations,
            "bev_metadata": {
                "num_objects": len(detected),
                "ground_points": state["n_ground"],
                "object_points": state["n_object"],
            },
        }

    def report_stub(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Interpretation-free lidar output for concurrent consumers (the
        fused pipeline hands this to the cross-modal agent while the
        interpret call is still in flight — round-2 VERDICT item 3
        endorses this trade: cross-modal sees the structured report +
        marker, minus the model's interpretation prose)."""
        return {
            "agent": self.agent_name,
            "modality": "lidar",
            "observations": self._append_marker(state["report"],
                                                state["detected"]),
        }

    # ------------------------------------------------------------------
    def _cluster_host(self, pc_np: np.ndarray, masks) -> Dict[str, np.ndarray]:
        """Exact C++ grid-DBSCAN fallback (cluster_backend='host')."""
        cfg = self.cfg
        from msc_tpu.data.lidar_io import dbscan_host

        obj_idx = np.flatnonzero(np.asarray(masks["object"]))
        labels, k = dbscan_host(pc_np[obj_idx], cfg.dbscan_eps,
                                cfg.dbscan_min_samples)
        point_cluster = np.full(len(pc_np), -1, np.int32)
        # drop tiny clusters + compact ids (parity lidar_agent.py:163-166)
        keep_ids = [c for c in range(k)
                    if (labels == c).sum() >= cfg.min_cluster_points]
        remap = {c: i for i, c in enumerate(keep_ids)}
        for c, i in remap.items():
            point_cluster[obj_idx[labels == c]] = i
        return {"point_cluster": point_cluster, "n_clusters": len(keep_ids)}

    def _build_classify_calls(self, pc_np: np.ndarray, clusters: Dict):
        """Render all clusters' multi-view grids and build the classify
        call specs (<=10 clusters per call, parity lidar_agent.py:177).
        Returns (calls, batch_metas)."""
        k = int(clusters["n_clusters"])
        if k == 0:
            return [], []
        point_cluster = clusters["point_cluster"]

        # host post-pass: re-join range-fragmented clusters (a far bus
        # splits into face fragments under fixed eps; the fragments then
        # classify as two-wheelers/pedestrians).  Applies identically to
        # the device voxel-CC and host DBSCAN backends.
        from msc_tpu.ops.clustering import (merge_fragment_clusters,
                                            split_oversize_clusters)

        point_cluster, k = merge_fragment_clusters(
            pc_np, point_cluster, k, eps=self.cfg.dbscan_eps)
        # ...and split contact blobs (two touching objects in one
        # cluster) whose box exceeds any single object's footprint
        point_cluster, k = split_oversize_clusters(pc_np, point_cluster, k)

        # per-cluster geometry (host; k is small)
        metas = []
        for c in range(k):
            pts = pc_np[point_cluster == c]
            mins, maxs = pts[:, :3].min(0), pts[:, :3].max(0)
            center = (mins + maxs) / 2
            dims = maxs - mins
            dist = float(np.hypot(center[0], center[1]))
            metas.append({
                "index": c, "center": center, "dimensions": dims,
                "distance": dist,
                "direction": direction_8way_host(center[0], center[1]),
                "num_points": int(len(pts)),
            })

        # batched multi-view rendering for ALL clusters at once; the grids
        # stay on device (they only feed the on-TPU VLM).  K pads to a
        # multiple of the classify batch so the splat/tile/ViT programs
        # keep ONE compiled shape regardless of scene content.
        batch_size = 10  # parity: <=10 clusters per model call
        k_pad = batch_size * (-(-k // batch_size))
        pts_buf, msk_buf = gather_cluster_points(pc_np, point_cluster, k_pad)
        with DEVICE_LOCK:
            grids = render_cluster_views(
                jnp.asarray(pts_buf), jnp.asarray(msk_buf),
                img_size=self.cfg.cluster_img_size)

        # all classify batches go out together (one batched model call in
        # the serial path; coalesced with other agents' calls in the
        # pipeline's fused path)
        calls = []
        batch_metas = []
        for start in range(0, k, batch_size):
            batch_meta = metas[start:start + batch_size]
            tile = tile_cluster_grids_device(grids[start:start + batch_size])
            calls.append(self._build_classify_call(tile, batch_meta))
            batch_metas.append(batch_meta)
        return calls, batch_metas

    def _build_classify_call(self, tile, metas: List[Dict]) -> dict:
        lines = ["Object Cluster Details:"]
        for i, m in enumerate(metas):
            c, d = m["center"], m["dimensions"]
            entry = (
                f"\nCluster #{i}:\n"
                f"  Position: ({c[0]:.1f}, {c[1]:.1f}, {c[2]:.1f})m\n"
                f"  Size: {d[0]:.1f} x {d[1]:.1f} x {d[2]:.1f}m (L x W x H)\n"
                f"  Distance: {m['distance']:.1f}m\n"
                f"  Direction: {m['direction']}\n"
                f"  Points: {m['num_points']}")
            if self.cfg.classify_hints:
                # host retrieval for classification (round-4 decomposition:
                # the 35M student misclassifies crops the geometry rule
                # gets right — 128/313 held-out failures).  The hint is
                # the SAME rule the analytic teacher answers with
                # (serving/analytic.py classify_cluster_geometry), so the
                # distillation target is consistent with the hint and the
                # student learns to copy it — the classify-prompt analogue
                # of the MQA fact line.
                from msc_tpu.serving.analytic import (
                    classify_cluster_geometry)

                # compute from the SAME rounded dims the prompt prints —
                # the analytic teacher re-derives the rule from the
                # "Size:" text, so hint and target must round identically
                g = classify_cluster_geometry(
                    (float(f"{d[0]:.1f}"), float(f"{d[1]:.1f}"),
                     float(f"{d[2]:.1f}")), int(m["num_points"]))
                entry += (f"\n  Geometry suggests: {g['category']} "
                          f"(confidence {g['confidence']:.2f})")
            lines.append(entry)
        user = (f"Classify these {len(metas)} object cluster(s):\n\n"
                + "\n".join(lines)
                + "\n\nAnalyze the multi-view visualizations and metadata, "
                  "then classify each object. Output valid JSON only.")
        messages = [
            {"role": "system", "content": _CLASSIFY_SYSTEM},
            {"role": "user", "content": [
                {"type": "image"},
                {"type": "text", "text": user},
            ]},
        ]
        return dict(messages=messages, temperature=0.2,
                    task="cluster_classify", images=[tile],
                    max_new_tokens=192)

    @staticmethod
    def _reconcile_with_geometry(meta: Dict, cls: Dict) -> Dict:
        """Host reconciliation of a parsed classification against the
        geometry rule (LiDARConfig.hint_reconcile).

        When the rule is confident (>=0.7 — a strong band match), its
        answer wins over the model's; below that the model's vision call
        decides.  Computed from the SAME rounded dims the classify
        prompt prints, so the override agrees with the displayed hint
        and with the analytic teacher's re-derivation.  Rationale in
        RESULTS.md (r13 decomposition): the 35M student drops or
        miscopies hint categories in multi-row classify JSON, producing
        wrong-fact captions the deterministic rule gets right."""
        from msc_tpu.serving.analytic import classify_cluster_geometry

        d = meta["dimensions"]
        g = classify_cluster_geometry(
            (float(f"{d[0]:.1f}"), float(f"{d[1]:.1f}"),
             float(f"{d[2]:.1f}")), int(meta["num_points"]))
        if g["confidence"] >= 0.7 and g["category"] != cls["category"]:
            return {"category": g["category"],
                    "confidence": g["confidence"]}
        return cls

    @staticmethod
    def _parse_classifications(response: str, metas: List[Dict]) -> List[Dict]:
        try:
            cleaned = response.strip()
            if cleaned.startswith("```"):
                cleaned = cleaned.split("```")[1]
                if cleaned.startswith("json"):
                    cleaned = cleaned[4:]
                cleaned = cleaned.strip()
            result = json.loads(cleaned)
            listed = result.get("classifications", [])
            out = []
            for i in range(len(metas)):
                hit = next((c for c in listed
                            if _as_int(c.get("cluster")) == i),
                           {"category": "unknown", "confidence": 0.5})
                # sanitize model JSON: a non-string category (int/float/
                # None) must not leak into the detection markers — counts
                # dicts keyed by it crash every later sorted() with
                # mixed-type keys ("'<' not supported between instances
                # of 'int' and 'str'", scene-159 eval losses), and a
                # string confidence crashes the >0.3 gate
                cat = hit.get("category", "unknown")
                cat = cat.strip().lower() if isinstance(cat, str) else ""
                try:
                    conf = float(hit.get("confidence", 0.5))
                except (TypeError, ValueError):
                    conf = 0.5
                out.append({"category": cat or "unknown",
                            "confidence": conf})
            return out
        except (json.JSONDecodeError, KeyError, IndexError):
            return [{"category": "unknown", "confidence": 0.5}
                    for _ in metas]

    # ------------------------------------------------------------------
    def _semantic_features(self, detected: List[DetectedObject],
                           n_ground: int, n_object: int) -> Dict[str, Any]:
        """Parity with `lidar_agent.py:644-694`."""
        counts: Dict[str, int] = {}
        for o in detected:
            counts[o.category] = counts.get(o.category, 0) + 1
        by_dir = {d: 0 for d in ("front", "back", "left", "right",
                                 "front_left", "front_right",
                                 "back_left", "back_right")}
        for o in detected:
            by_dir[o.direction] += 1
        close = [o for o in detected if o.distance < 10]
        medium = [o for o in detected if 10 <= o.distance < 30]
        far = [o for o in detected if o.distance >= 30]
        total_points = n_ground + n_object
        vehicles = [o for o in detected if o.category in ("car", "truck", "bus")]
        density = ("heavy" if len(vehicles) > 10
                   else "moderate" if len(vehicles) > 5 else "light")
        nearest = min(detected, key=lambda o: o.distance) if detected else None
        return {
            "total_objects": len(detected),
            "object_counts": counts,
            "objects_by_direction": by_dir,
            "distance_distribution": {"close": len(close),
                                      "medium": len(medium),
                                      "far": len(far)},
            "scene_characteristics": {
                "object_point_ratio": (n_object / total_points
                                       if total_points else 0.0),
                "traffic_density": density,
                "total_points": total_points,
            },
            "nearest_object": nearest,
        }

    def _report(self, features: Dict, detected: List[DetectedObject]) -> str:
        """Parity with `lidar_agent.py:696-742`."""
        lines = ["=== LiDAR Scene Analysis ===\n",
                 f"Total detected objects: {features['total_objects']}"]
        if features["object_counts"]:
            lines.append("\nObject Distribution:")
            for cat, cnt in sorted(features["object_counts"].items()):
                lines.append(f"  - {cnt} {cat}(s)")
        lines.append("\nSpatial Distribution:")
        for direction, cnt in features["objects_by_direction"].items():
            if cnt > 0:
                cats = ", ".join({o.category for o in detected
                                  if o.direction == direction})
                lines.append(f"  - {direction}: {cnt} objects ({cats})")
        dd = features["distance_distribution"]
        lines.append("\nDistance Distribution:")
        lines.append(f"  - Close (<10m): {dd['close']} objects")
        lines.append(f"  - Medium (10-30m): {dd['medium']} objects")
        lines.append(f"  - Far (>30m): {dd['far']} objects")
        nearest = features["nearest_object"]
        if nearest:
            lines.append("\nNearest Object:")
            lines.append(f"  - Type: {nearest.category}")
            lines.append(f"  - Distance: {nearest.distance:.1f}m")
            lines.append(f"  - Direction: {nearest.direction}")
        sc = features["scene_characteristics"]
        lines.append("\nScene Characteristics:")
        lines.append(f"  - Traffic density: {sc['traffic_density']}")
        lines.append(f"  - Object point ratio: {sc['object_point_ratio']:.2%}")
        return "\n".join(lines)

    def _interpret_spec(self, report: str, semantic_bev: np.ndarray,
                        context: Optional[Dict]) -> dict:
        user = (f"Analyze this driving scene from LiDAR data:\n\n{report}\n\n"
                "Provide a high-level interpretation of the scene, including:\n"
                "1. Overall scene context (urban/highway, crowded/sparse, etc.)\n"
                "2. Key objects and their significance\n"
                "3. Potential risks or safety concerns\n"
                "4. Notable spatial patterns or relationships")
        if context:
            user += f"\n\nAdditional context from other sensors:\n{json.dumps(context, indent=2)}"
        messages = [
            {"role": "system", "content": _INTERPRET_SYSTEM},
            {"role": "user", "content": [
                {"type": "image"},
                {"type": "text", "text": user},
            ]},
        ]
        return dict(messages=messages, temperature=0.4,
                    task="lidar_interpret", images=[semantic_bev],
                    max_new_tokens=128)

    @staticmethod
    def _append_marker(observations: str,
                       detected: List[DetectedObject]) -> str:
        payload = [{
            "category": ("adult pedestrian" if o.category == "pedestrian"
                         else o.category.replace("_", " ")),
            "direction": camera_sextant(o.position.tolist()),
            "distance": round(o.distance, 1),
            "position": [round(float(o.position[0]), 1),
                         round(float(o.position[1]), 1)],
            "state": "stopped",
        } for o in detected]
        marker = f"{DET_MARKER} {json.dumps(payload)}"
        # dedup on an exact line-start marker (a prose mention of the
        # marker name must not suppress the real payload line)
        if any(line.startswith(DET_MARKER)
               for line in observations.splitlines()):
            return observations
        return observations + "\n" + marker

    @staticmethod
    def _to_dict(o: DetectedObject) -> Dict[str, Any]:
        """Parity with `lidar_agent.py:806-817`."""
        return {
            "category": o.category,
            "position": np.asarray(o.position, dtype=float).tolist(),
            "dimensions": np.asarray(o.dimensions, dtype=float).tolist(),
            "num_points": o.num_points,
            "distance": float(o.distance),
            "direction": o.direction,
            "confidence": float(o.confidence),
        }

    # -- offline helpers (tools/export parity) --------------------------
    def generate_bev(self, point_cloud: np.ndarray) -> Dict[str, np.ndarray]:
        """BEV maps without any model calls (parity with the MockClient
        trick at `src/export_sample_data.py:53-78`, now a first-class API)."""
        cfg = self.cfg
        pc_np, n = pad_point_cloud(point_cloud, cfg.max_points)
        pc = jnp.asarray(pc_np)
        masks = filter_and_segment(
            pc, n, min_range=cfg.min_range, max_range=cfg.max_range,
            min_z=cfg.min_z, max_z=cfg.max_z, ground_z=cfg.ground_z)
        bev = rasterize_bev(pc, masks["ground"], masks["object"],
                            res=cfg.bev_resolution, bev_range=cfg.bev_range)
        out = jax.device_get(bev)
        out["semantic"] = decorate_semantic_bev(
            np.asarray(out["semantic"]), cfg.bev_resolution, cfg.bev_range)
        return out
