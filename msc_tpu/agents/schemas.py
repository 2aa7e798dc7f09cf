"""Structured-output schema contracts.

These pydantic models define the byte-compatible JSON interfaces of the
framework; field names, nesting, and order must match the reference:

- StructuredCaption (+submodels): `src/agents/structure_caption/
  caption_agent.py:7-44` — the canonical caption schema, explicitly
  required to stay byte-compatible (BASELINE.json north star).
- HierarchicalSceneGraph (+submodels): `src/agents/content_transform/
  scenegraph_agent.py:18-120`.
- SuggestionResponse: `src/agents/refinement/suggester_agent.py:6-16`.
- RefinedFeaturesResponse: `src/agents/refinement/editor_agent.py:8-11`.

They double as constrained-decoding grammars: the serving layer compiles
them into byte-level DFAs (`msc_tpu/serving/structured.py`).
"""

from __future__ import annotations

from typing import List

from pydantic import BaseModel, Field


# ---------------------------------------------------------------------------
# Structured caption (Layer 4 output contract)
# ---------------------------------------------------------------------------

class EgoVehicle(BaseModel):
    """Ego vehicle state"""
    action: str = Field(description="Current action (e.g., driving, turning, stopped)")
    lane_position: str = Field(description="Position in lane (center, left, right)")
    speed_estimate: str = Field(description="Estimated speed category (slow, moderate, fast)")


class CaptionSceneObject(BaseModel):
    """Detected object in the scene"""
    category: str = Field(description="Object type (car, truck, pedestrian, etc.)")
    position: str = Field(description="Relative position (front/back/left/right, distance)")
    state: str = Field(description="Object state (static, moving, stopped)")
    attributes: List[str] = Field(description="Relevant attributes")
    visibility: str = Field(description="Visibility level (high, medium, low)")


class CaptionRoadStructure(BaseModel):
    """Road structure information"""
    type: str = Field(description="Road type (intersection, straight, curve, etc.)")
    lanes: str = Field(description="Number and configuration of lanes")
    markings: List[str] = Field(description="Visible road markings")


class CaptionEnvironment(BaseModel):
    """Environmental conditions"""
    lighting: str = Field(description="Lighting conditions (day, night, dusk, dawn)")
    weather: str = Field(description="Weather conditions (clear, rain, fog, etc.)")
    location_type: str = Field(description="Location type (urban, highway, residential)")


class StructuredCaption(BaseModel):
    """Complete structured caption for autonomous driving scene.

    The ``json_schema_extra`` size bounds below do NOT change the wire
    format or validation (byte-compatibility contract); they parameterize
    the constrained-decoding DFA (`msc_tpu/serving/structured.py`):
    real scenes carry 23-69 annotations (SURVEY.md section 6), so
    ``objects`` must hold >=32 entries on the VLM path.
    """
    scene_summary: str = Field(description="Brief overall description of the scene",
                               json_schema_extra={"maxLength": 160})
    ego_vehicle: EgoVehicle = Field(description="Ego vehicle state and action")
    objects: List[CaptionSceneObject] = Field(description="List of detected objects in the scene",
                                              json_schema_extra={"maxItems": 32})
    road_structure: CaptionRoadStructure = Field(description="Road structure and layout")
    environment: CaptionEnvironment = Field(description="Environmental conditions")
    safety_critical: List[str] = Field(description="List of safety-relevant observations",
                                       json_schema_extra={"maxItems": 12})


# ---------------------------------------------------------------------------
# Hierarchical scene graph (Layer 1 scene-graph agent contract)
# ---------------------------------------------------------------------------

class SceneObject(BaseModel):
    """Individual object in the scene"""
    id: str = Field(description="Unique object identifier")
    category: str = Field(description="Object category (car, pedestrian, etc.)")
    subcategory: str = Field(description="More specific type (sedan, adult, etc.)")
    position_x: float = Field(description="X position in meters")
    position_y: float = Field(description="Y position in meters")
    position_z: float = Field(description="Z position in meters")
    distance_to_ego: float = Field(description="Distance from ego vehicle in meters")
    direction: str = Field(description="Direction from ego (front, back, left, right)")
    state: str = Field(description="Object state (moving, stopped, parked)")
    visibility: str = Field(description="Visibility level (high, medium, low)")


class RoadElement(BaseModel):
    """Road-related element"""
    element_type: str = Field(description="Type of road element (lane, marking, sign)")
    description: str = Field(description="Description of the element")
    location: str = Field(description="Location relative to ego")


class LaneInfo(BaseModel):
    """Lane information"""
    lane_count: int = Field(description="Number of visible lanes")
    lane_type: str = Field(description="Lane type (highway, urban, intersection)")
    ego_lane_position: str = Field(description="Ego vehicle position (left, center, right)")
    lane_markings: List[str] = Field(description="Visible lane markings")


class RoadStructure(BaseModel):
    """Road structure and layout"""
    road_type: str = Field(description="Type of road (highway, urban street, intersection)")
    lanes: LaneInfo = Field(description="Lane information")
    road_elements: List[RoadElement] = Field(description="Road signs, markings, infrastructure")
    surface_condition: str = Field(description="Road surface condition")


class SidewalkArea(BaseModel):
    """Sidewalk area with pedestrians and objects"""
    has_sidewalk: bool = Field(description="Whether sidewalk is visible")
    pedestrians: List[SceneObject] = Field(description="Pedestrians on sidewalk")
    static_objects: List[SceneObject] = Field(description="Static objects (benches, trash cans)")
    location: str = Field(description="Sidewalk location (left, right, both)")


class TrafficParticipants(BaseModel):
    """Active traffic participants on the road"""
    vehicles: List[SceneObject] = Field(description="Vehicles on the road")
    cyclists: List[SceneObject] = Field(description="Bicycles and motorcycles")
    vulnerable_road_users: List[SceneObject] = Field(description="Pedestrians crossing or near road")


class StaticInfrastructure(BaseModel):
    """Static infrastructure elements"""
    barriers: List[SceneObject] = Field(description="Barriers and guardrails")
    traffic_cones: List[SceneObject] = Field(description="Traffic cones")
    construction: List[SceneObject] = Field(description="Construction equipment")
    other: List[SceneObject] = Field(description="Other static objects")


class EnvironmentContext(BaseModel):
    """Environmental context"""
    lighting: str = Field(description="Lighting conditions (day, night, dusk, dawn)")
    weather: str = Field(description="Weather conditions (clear, rain, fog)")
    visibility_overall: str = Field(description="Overall visibility (good, moderate, poor)")
    location_type: str = Field(description="Location type (urban, highway, residential)")


class SpatialZone(BaseModel):
    """Spatial zone around ego vehicle"""
    zone_name: str = Field(description="Zone identifier (front_close, left_medium, etc.)")
    objects: List[SceneObject] = Field(description="Objects in this zone")
    is_clear: bool = Field(description="Whether zone is clear of obstacles")
    criticality: str = Field(description="Safety criticality (high, medium, low)")


class HierarchicalSceneGraph(BaseModel):
    """Complete hierarchical scene graph"""
    scene_summary: str = Field(description="Brief overall scene description")
    environment: EnvironmentContext = Field(description="Environmental conditions")
    road_structure: RoadStructure = Field(description="Road layout and structure")
    traffic_participants: TrafficParticipants = Field(description="Active road users")
    sidewalk_areas: SidewalkArea = Field(description="Sidewalk and pedestrian areas")
    static_infrastructure: StaticInfrastructure = Field(description="Static objects and barriers")
    spatial_zones: List[SpatialZone] = Field(description="Spatial zones around ego vehicle")
    safety_critical_elements: List[str] = Field(description="Safety-critical observations")
    total_objects: int = Field(description="Total number of detected objects")


# ---------------------------------------------------------------------------
# Refinement contracts
# ---------------------------------------------------------------------------

class SuggestionResponse(BaseModel):
    """Structured response from Suggester agent"""
    has_suggestions: bool = Field(
        description="True if there are meaningful suggestions, False if features are complete")
    suggestions: List[str] = Field(
        description="List of specific improvement suggestions")
    reasoning: str = Field(
        description="Brief explanation of the suggestions or why no suggestions are needed",
        json_schema_extra={"maxLength": 160})


class RefinedFeaturesResponse(BaseModel):
    """Structured response from Editor agent.

    ``caption`` carries the full refined prose — the DFA string bound is
    raised well above the 48-byte default so the VLM path's refinement
    loop is not structurally capped to one sentence.
    """
    caption: str = Field(description="The refined caption text",
                         json_schema_extra={"maxLength": 1024})
    changes_made: List[str] = Field(description="List of key changes applied")


class RefineStepResponse(BaseModel):
    """Fused suggest+edit refinement step (TPU-native call fusion, no
    reference counterpart — the reference spends two serialized HTTPS
    calls per iteration, `src/agents/refinement/suggester_agent.py:21` +
    `editor_agent.py:17`; on-TPU both share the long grounding prefill,
    so one constrained decode emits the critique AND the rewrite).

    Field order is decode order: the model first commits to
    ``has_suggestions``; when false it emits an empty ``caption`` (the
    controller keeps the previous caption on convergence), so the
    converged step costs only a few tokens."""
    has_suggestions: bool = Field(
        description="True if there are meaningful suggestions, False if features are complete")
    suggestions: List[str] = Field(
        description="List of specific improvement suggestions")
    reasoning: str = Field(
        description="Brief explanation of the suggestions or why no suggestions are needed",
        json_schema_extra={"maxLength": 160})
    caption: str = Field(
        description="The refined caption text (empty when has_suggestions is false)",
        json_schema_extra={"maxLength": 1024})
    changes_made: List[str] = Field(description="List of key changes applied")
