"""SceneGraphAgent: annotations -> hierarchical scene graph (Layer 1).

Behavior parity with `src/agents/content_transform/scenegraph_agent.py:
127-495`: parse annotations (distance, 4-quadrant direction, state from
speed > 0.5 m/s, visibility from token text), bucket into categories and
the 9 fixed spatial zones, one structured-output model call producing a
HierarchicalSceneGraph, hand-built "unknown" fallback on error, and the
human-readable summary renderer.

Differences (documented):
- geometry runs through the batched device kernels (`msc_tpu/ops/boxgeom`);
- the model prompt carries the FULL object list (the reference truncates
  to 5 vehicles + 5 pedestrians, `scenegraph_agent.py:345-354` — a
  token-cost workaround that no longer applies on-TPU);
- observations get an ``OBJECTS_JSON`` marker line so annotation knowledge
  survives the text-channel layers (see msc_tpu/serving/analytic.py).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.schemas import (
    EnvironmentContext,
    HierarchicalSceneGraph,
    LaneInfo,
    RoadStructure,
    SidewalkArea,
    StaticInfrastructure,
    TrafficParticipants,
)
from msc_tpu.data.mqa import camera_sextant
from msc_tpu.ops.boxgeom import DIR4, annotations_to_arrays, direction_4way
from msc_tpu.serving.analytic import OBJ_MARKER

_SYSTEM_PROMPT = """You are an expert at building hierarchical scene graphs for autonomous driving.

Create a tree-structured scene graph organizing the scene into:
1. Environment: lighting, weather, location type
2. Road Structure: lanes, markings, road elements
3. Traffic Participants: vehicles, cyclists, pedestrians on/near road
4. Sidewalk Areas: pedestrians on sidewalk, static objects
5. Static Infrastructure: barriers, cones, construction
6. Spatial Zones: objects organized by distance and direction from ego
7. Safety Critical: important safety observations

For each object, provide: id, category, subcategory, position (x, y, z),
distance_to_ego, direction, state (moving/stopped/parked), visibility.

CRITICAL INSTRUCTIONS:
- Include EVERY piece of information available - no summarization
- Be exhaustive and thorough - longer captions with more detail are better
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Write as if you're describing the scene to someone who can't see it"""

# 9 fixed spatial zones (parity `scenegraph_agent.py:136-146`).
SPATIAL_ZONES = {
    "front_close": (0, 10, "front"),
    "front_medium": (10, 30, "front"),
    "front_far": (30, 50, "front"),
    "left_close": (0, 10, "left"),
    "left_medium": (10, 30, "left"),
    "right_close": (0, 10, "right"),
    "right_medium": (10, 30, "right"),
    "back_close": (0, 10, "back"),
    "back_medium": (10, 30, "back"),
}


class SceneGraphAgent(BaseAgent):
    """Builds hierarchical scene graphs from nuScenes annotations."""

    def process(self, annotations: List[Dict],
                context: Optional[Dict] = None) -> Dict[str, Any]:
        spec, state = self.prepare_call(annotations, context)
        try:
            graph = self.call_llm(**spec)
        except Exception as e:  # fallback graph (parity :379-421)
            print(f"  [SceneGraph] error, using fallback: {e}")
            graph = None
        return self.finish(graph, state)

    def prepare_call(self, annotations: List[Dict],
                     context: Optional[Dict] = None):
        """Host geometry + the structured scene-graph call as a spec
        (fused-path seam).  Returns (spec, state) for ``finish``."""
        objects = self._parse_annotations(annotations)
        categorized = self._categorize(objects)
        zones = self._zones(objects)
        spec = self._graph_call_spec(categorized, zones, objects,
                                     annotations, context)
        return spec, {"objects": objects, "annotations": annotations}

    def finish(self, graph, state) -> Dict[str, Any]:
        """Consume the (parsed) graph — or None to use the reference's
        hand-built fallback graph — and render observations."""
        if graph is None:
            graph = self._fallback_graph(len(state["annotations"]))
        summary = self._summary(graph)
        summary = self._append_marker(summary, state["objects"])
        return {
            "agent": self.agent_name,
            "modality": "scene_graph",
            "scene_graph": graph.model_dump(),
            "observations": summary,
        }

    # ------------------------------------------------------------------
    def _parse_annotations(self, annotations: List[Dict]) -> List[Dict]:
        """Parity with `scenegraph_agent.py:180-247` (distance/direction on
        the raw translations; state from planar speed; visibility from
        token text), vectorized through the device kernels."""
        if not annotations:
            return []
        arrays = annotations_to_arrays(annotations)
        xy = arrays["translation"][:, :2]
        dist = np.hypot(xy[:, 0], xy[:, 1])
        d4 = np.asarray(direction_4way(jnp.asarray(xy, jnp.float32)))
        speed = np.hypot(arrays["velocity"][:, 0], arrays["velocity"][:, 1])

        objects = []
        for i, ann in enumerate(annotations):
            category = str(ann.get("category_name", "unknown")).lower()
            for prefix in ("vehicle.", "human.pedestrian.",
                           "movable_object.", "static_object."):
                category = category.replace(prefix, "")
            vis_token = str(ann.get("visibility_token", ""))
            if "80" in vis_token or "100" in vis_token:
                visibility = "high"
            elif "40" in vis_token or "60" in vis_token:
                visibility = "medium"
            else:
                visibility = "low"
            objects.append({
                "id": f"obj_{i}",
                "category": category,
                "position": list(ann.get("translation", [0, 0, 0])),
                "distance": float(dist[i]),
                "direction": DIR4[d4[i]],
                "state": "moving" if speed[i] > 0.5 else "stopped",
                "visibility": visibility,
                "attributes": ann.get("attribute_tokens", []),
            })
        return objects

    @staticmethod
    def _categorize(objects: List[Dict]) -> Dict[str, List[Dict]]:
        """Parity with `scenegraph_agent.py:249-279`."""
        out = {k: [] for k in ("vehicles", "cyclists", "pedestrians",
                               "barriers", "traffic_cones", "construction",
                               "other")}
        for o in objects:
            c = o["category"]
            if any(k in c for k in ("car", "truck", "bus", "trailer")):
                out["vehicles"].append(o)
            elif "bicycle" in c or "motorcycle" in c:
                out["cyclists"].append(o)
            elif any(k in c for k in ("pedestrian", "adult", "child")):
                out["pedestrians"].append(o)
            elif "barrier" in c:
                out["barriers"].append(o)
            elif "cone" in c:
                out["traffic_cones"].append(o)
            elif "construction" in c:
                out["construction"].append(o)
            else:
                out["other"].append(o)
        return out

    @staticmethod
    def _zones(objects: List[Dict]) -> Dict[str, List[Dict]]:
        zones = {name: [] for name in SPATIAL_ZONES}
        for o in objects:
            for name, (lo, hi, d) in SPATIAL_ZONES.items():
                if o["direction"] == d and lo <= o["distance"] < hi:
                    zones[name].append(o)
                    break
        return zones

    # ------------------------------------------------------------------
    def _graph_call_spec(self, categorized, zones, objects, annotations,
                         context) -> dict:
        details = [{
            "id": o["id"], "category": o["category"],
            "position": o["position"], "distance": round(o["distance"], 1),
            "direction": o["direction"], "state": o["state"],
            "visibility": o["visibility"],
        } for o in objects]
        summary = f"""
Total objects: {len(annotations)}

By category:
- Vehicles: {len(categorized['vehicles'])}
- Cyclists: {len(categorized['cyclists'])}
- Pedestrians: {len(categorized['pedestrians'])}
- Barriers: {len(categorized['barriers'])}
- Traffic cones: {len(categorized['traffic_cones'])}
- Construction: {len(categorized['construction'])}

Spatial distribution:
- Front close (<10m): {len(zones.get('front_close', []))}
- Front medium (10-30m): {len(zones.get('front_medium', []))}
- Left close (<10m): {len(zones.get('left_close', []))}
- Right close (<10m): {len(zones.get('right_close', []))}

Object details:
{json.dumps(details, indent=None)}
"""
        user = (f"Build a hierarchical scene graph from this driving scene:\n"
                f"\n{summary}\n\nCreate a complete scene graph with all "
                "hierarchical levels filled.")
        if context:
            user += (f"\n\nAdditional context from other sensors:\n"
                     f"{json.dumps(context, indent=2)[:500]}")
        messages = [
            {"role": "system", "content": _SYSTEM_PROMPT},
            {"role": "user", "content": user},
        ]
        return dict(messages=messages, temperature=0.4,
                    response_format=HierarchicalSceneGraph,
                    task="scene_graph")

    @staticmethod
    def _fallback_graph(total_objects: int) -> HierarchicalSceneGraph:
        """Hand-built "unknown" fallback (parity :379-421)."""
        return HierarchicalSceneGraph(
                scene_summary="Error generating scene graph",
                environment=EnvironmentContext(
                    lighting="unknown", weather="unknown",
                    visibility_overall="unknown", location_type="unknown"),
                road_structure=RoadStructure(
                    road_type="unknown",
                    lanes=LaneInfo(lane_count=0, lane_type="unknown",
                                   ego_lane_position="unknown",
                                   lane_markings=[]),
                    road_elements=[], surface_condition="unknown"),
                traffic_participants=TrafficParticipants(
                    vehicles=[], cyclists=[], vulnerable_road_users=[]),
                sidewalk_areas=SidewalkArea(
                    has_sidewalk=False, pedestrians=[], static_objects=[],
                    location="unknown"),
                static_infrastructure=StaticInfrastructure(
                    barriers=[], traffic_cones=[], construction=[], other=[]),
                spatial_zones=[],
                safety_critical_elements=["Scene graph generation failed"],
                total_objects=total_objects,
            )

    # ------------------------------------------------------------------
    @staticmethod
    def _summary(g: HierarchicalSceneGraph) -> str:
        """Human-readable renderer (parity `scenegraph_agent.py:423-490`)."""
        lines = ["=== Hierarchical Scene Graph ===\n",
                 f"Scene: {g.scene_summary}",
                 f"Total objects: {g.total_objects}\n",
                 "Environment:",
                 f"  - Lighting: {g.environment.lighting}",
                 f"  - Weather: {g.environment.weather}",
                 f"  - Location: {g.environment.location_type}\n",
                 "Road Structure:",
                 f"  - Type: {g.road_structure.road_type}",
                 f"  - Lanes: {g.road_structure.lanes.lane_count} "
                 f"{g.road_structure.lanes.lane_type} lanes",
                 f"  - Ego position: {g.road_structure.lanes.ego_lane_position} lane"]
        if g.road_structure.road_elements:
            lines.append(f"  - Elements: {len(g.road_structure.road_elements)} "
                         "road signs/markings\n")
        t = g.traffic_participants
        lines += ["Traffic Participants:",
                  f"  - Vehicles: {len(t.vehicles)}",
                  f"  - Cyclists: {len(t.cyclists)}",
                  f"  - Vulnerable road users: {len(t.vulnerable_road_users)}\n"]
        if g.sidewalk_areas.has_sidewalk:
            lines += [f"Sidewalk Areas ({g.sidewalk_areas.location}):",
                      f"  - Pedestrians: {len(g.sidewalk_areas.pedestrians)}",
                      f"  - Static objects: {len(g.sidewalk_areas.static_objects)}\n"]
        infra = g.static_infrastructure
        total_static = (len(infra.barriers) + len(infra.traffic_cones)
                        + len(infra.construction) + len(infra.other))
        if total_static > 0:
            lines.append("Static Infrastructure:")
            if infra.barriers:
                lines.append(f"  - Barriers: {len(infra.barriers)}")
            if infra.traffic_cones:
                lines.append(f"  - Traffic cones: {len(infra.traffic_cones)}")
            if infra.construction:
                lines.append(f"  - Construction: {len(infra.construction)}\n")
        if g.spatial_zones:
            lines.append("Spatial Zones:")
            for z in g.spatial_zones:
                if z.objects:
                    lines.append(f"  - {z.zone_name}: {len(z.objects)} objects "
                                 f"(criticality: {z.criticality})")
        if g.safety_critical_elements:
            lines.append("\nSafety Critical Elements:")
            for e in g.safety_critical_elements:
                lines.append(f"  - {e}")
        return "\n".join(lines)

    @staticmethod
    def _append_marker(summary: str, objects: List[Dict]) -> str:
        payload = [{
            "category": o["category"],
            "direction": camera_sextant(o["position"]),
            "distance": round(o["distance"], 1),
            # ego-frame coordinates ride along so downstream captions can
            # answer <loc> questions (VERDICT round-1 item 7)
            "position": [round(float(o["position"][0]), 1),
                         round(float(o["position"][1]), 1)],
            "state": o["state"],
            "visibility": o["visibility"],
        } for o in objects]
        return summary + f"\n{OBJ_MARKER} {json.dumps(payload)}"
