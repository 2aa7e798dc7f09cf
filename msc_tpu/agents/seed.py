"""Layer 2: seed caption generation (5 focused captions + merge).

Behavior parity with `src/agents/seed_generation/seedfeature_agent.py:7-204`
(focus areas scene_structure / objects / spatial_relations / dynamics /
safety, then a lossless merge in the fixed order at `:132`).

TPU-native difference: the reference runs its 6 calls strictly in series
(`seedfeature_agent.py:184-193`); here the 5 focus captions dispatch as ONE
batched device call via ``ChatClient.call_llm_batch`` — a 5x latency cut on
the VLM backend (SURVEY.md section 7 step 5).
"""

from __future__ import annotations

from typing import Any, Dict, List

from msc_tpu.agents.base import BaseAgent
from msc_tpu.serving.client import ChatClient

FOCUS_AREAS = ["scene_structure", "objects", "spatial_relations",
               "dynamics", "safety"]

_FOCUS_PROMPTS = {
    "objects": """Write a comprehensive description of ALL objects in the scene.
Include every single object detected - vehicles (specify types: cars, trucks, buses, trailers),
pedestrians (adults, children, their locations), cyclists, motorcycles, barriers, traffic cones,
construction equipment, and any other objects. For each object mention: its type, approximate
position/direction from ego vehicle, distance if known, state (moving/stopped/parked), and any
notable attributes. Don't summarize - describe each object individually with all available details.""",
    "scene_structure": """Write a comprehensive description of the road structure and environment.
Include: road type, number of lanes, lane markings, ego vehicle's lane position, road surface
condition, presence of sidewalks, crosswalks, intersections, traffic lights, road signs, road
geometry, visible infrastructure, parking areas, and any other structural elements. Be exhaustive
and mention every visible element.""",
    "spatial_relations": """Write a comprehensive description of spatial relationships in the scene.
Describe the position of every object relative to the ego vehicle (front/back/left/right and
approximate distances in meters). Describe objects' positions relative to each other. Include all
distance information and directional relationships. Be thorough and don't omit any spatial detail.""",
    "dynamics": """Write a comprehensive description of all motion and dynamic aspects in the scene.
Describe which objects are moving and which are stationary. For moving objects, describe their
direction of movement, approximate speed, trajectory, and any changes in motion. Note any stopped
vehicles and whether they appear parked or temporarily stopped. Describe every dynamic element
comprehensively.""",
    "safety": """Write a comprehensive description of safety-critical elements and potential risks.
Identify all objects that could pose safety concerns: close vehicles, pedestrians near or crossing
the road, cyclists in traffic, objects in the ego vehicle's path, stopped vehicles, construction
zones, poor visibility areas, vulnerable road users, and any unusual or hazardous situations. For
each safety concern, explain why it's critical. Be thorough.""",
}

_MERGE_SYSTEM = """You are an expert at synthesizing comprehensive scene descriptions for autonomous driving.

Your task is to merge multiple detailed captions (each focusing on a different aspect) into ONE
single, comprehensive, flowing narrative description of the entire scene.

CRITICAL INSTRUCTIONS:
- Combine ALL information from ALL captions into one unified description
- DO NOT lose any information during the merge - every detail must be preserved
- Eliminate redundancy, but keep all unique information
- Preserve any machine-readable marker lines (OBJECTS_JSON / DETECTIONS_JSON) verbatim
- Longer is better - comprehensiveness is more important than brevity
- Write in flowing paragraphs, no section headers or bullet points"""


def _focus_system_prompt(focus_area: str) -> str:
    return f"""You are an expert at writing comprehensive, detailed captions for autonomous driving scenes.
Your focus area is: {focus_area}

CRITICAL INSTRUCTIONS:
- Write in complete, flowing sentences using natural language
- Include EVERY piece of information available - no summarization
- Be exhaustive and thorough - longer captions with more detail are better
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Preserve any machine-readable marker lines (OBJECTS_JSON / DETECTIONS_JSON) verbatim
- Write as if you're describing the scene to someone who can't see it

{_FOCUS_PROMPTS.get(focus_area, '')}"""


def _format_observation(o) -> str:
    """Render one Layer-1 observation for a prompt.  Dict observations
    (the camera agent's {view -> text}) format as per-view blocks rather
    than ``str(dict)`` — machine-readable marker lines (OBJECTS_JSON /
    CAMERAS_JSON / ...) must stay at line starts to survive the
    text-channel layers (serving/analytic.py extract_markers is
    line-anchored)."""
    if isinstance(o, dict):
        return "\n".join(f"{k}:\n{v}" for k, v in o.items())
    return str(o)


class FocusedCaptionAgent(BaseAgent):
    """One focus-area caption (parity `seedfeature_agent.py:7-92`)."""

    def __init__(self, client, model: str, agent_name: str, focus_area: str):
        super().__init__(client, model, agent_name)
        self.focus_area = focus_area

    def build_call(self, transformed_content: Dict) -> dict:
        observations = transformed_content.get("observations", [])
        observations_text = "\n\n".join(
            _format_observation(o) for o in observations if o)
        user = (f"Write a comprehensive {self.focus_area} caption for this "
                f"autonomous driving scene.\n\nScene Information:\n"
                f"{observations_text}\n\nWrite a detailed, flowing caption "
                f"that includes every single detail about {self.focus_area}. "
                "Don't omit anything. Write in natural prose, not lists.")
        return dict(
            messages=[{"role": "system",
                       "content": _focus_system_prompt(self.focus_area)},
                      {"role": "user", "content": user}],
            temperature=0.6,
            task=f"seed:{self.focus_area}",
            max_new_tokens=160,
        )

    def generate(self, transformed_content: Dict) -> Dict[str, Any]:
        response = self.call_llm(**self.build_call(transformed_content))
        return {"agent": self.agent_name, "focus_area": self.focus_area,
                "caption": response}


class ComprehensiveCaptionMerger(BaseAgent):
    """Merges focused captions (parity `seedfeature_agent.py:95-148`)."""

    def merge_captions(self, focused_captions: List[Dict[str, Any]]) -> str:
        by_focus = {c["focus_area"]: c["caption"] for c in focused_captions}
        captions_text = ""
        for area in FOCUS_AREAS:  # fixed merge order (parity :132)
            if area in by_focus:
                captions_text += f"\n\n{area.upper()} CAPTION:\n{by_focus[area]}"
        user = (f"Merge these detailed captions into ONE comprehensive scene "
                f"description:\n{captions_text}\n\nCreate a single, flowing "
                "narrative that includes ALL information from all captions. "
                "Don't lose any details.")
        messages = [{"role": "system", "content": _MERGE_SYSTEM},
                    {"role": "user", "content": user}]
        return self.call_llm(messages, temperature=0.5, task="merge",
                             max_new_tokens=256)


class SeedFeatureAgent:
    """Layer-2 system: 5 focused agents + merger
    (parity `seedfeature_agent.py:151-198`)."""

    def __init__(self, client: ChatClient, model: str):
        self.client = client
        self.model = model
        self.focused_agents = [
            FocusedCaptionAgent(client, model, f"FocusedCaption_{a}", a)
            for a in FOCUS_AREAS
        ]
        self.merger = ComprehensiveCaptionMerger(client, model, "CaptionMerger")

    def generate_comprehensive_caption(self, transformed_content: Dict) -> Dict[str, Any]:
        # one batched call for all five focus areas
        calls = [a.build_call(transformed_content) for a in self.focused_agents]
        responses = self.client.call_llm_batch(calls)
        focused = [
            {"agent": a.agent_name, "focus_area": a.focus_area, "caption": r}
            for a, r in zip(self.focused_agents, responses)
        ]
        final_caption = self.merger.merge_captions(focused)
        return {"focused_captions": focused, "final_caption": final_caption}
