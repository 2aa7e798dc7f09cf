"""Agent layer: the 10 agent behaviors of the reference's 4-layer graph
(`src/agents/__init__.py:1-32`), re-implemented over the on-TPU
``call_llm`` seam and the device kernel layer."""

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.camera import CameraAgent
from msc_tpu.agents.crossmodal import CrossModalAgent
from msc_tpu.agents.lidar import LiDARAgent, DetectedObject
from msc_tpu.agents.scenegraph import SceneGraphAgent
from msc_tpu.agents.seed import SeedFeatureAgent, FocusedCaptionAgent, ComprehensiveCaptionMerger
from msc_tpu.agents.suggester import SuggesterAgent
from msc_tpu.agents.editor import EditorAgent
from msc_tpu.agents.refinement import IterativeRefinementController
from msc_tpu.agents.caption import CaptionGenerator
from msc_tpu.agents.schemas import (
    StructuredCaption,
    HierarchicalSceneGraph,
    SuggestionResponse,
    RefinedFeaturesResponse,
)

__all__ = [
    "BaseAgent",
    "CameraAgent",
    "CrossModalAgent",
    "LiDARAgent",
    "DetectedObject",
    "SceneGraphAgent",
    "SeedFeatureAgent",
    "FocusedCaptionAgent",
    "ComprehensiveCaptionMerger",
    "SuggesterAgent",
    "EditorAgent",
    "IterativeRefinementController",
    "CaptionGenerator",
    "StructuredCaption",
    "HierarchicalSceneGraph",
    "SuggestionResponse",
    "RefinedFeaturesResponse",
]
