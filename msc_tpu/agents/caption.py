"""CaptionGenerator: structured caption + MQA answering (Layer 4).

Behavior parity with `src/agents/structure_caption/caption_agent.py:47-167`:
- ``generate_structured_caption`` produces the canonical StructuredCaption
  JSON (byte-compatible schema, BASELINE.json north star), injects
  ``full_caption`` = the refined prose, and returns the hand-built
  "unknown" fallback dict with a ``parse_error`` flag on failure;
- ``answer_mqa_question`` answers with the nuScenes-MQA XML tag contract
  at temperature 0.2.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.schemas import StructuredCaption

_CAPTION_SYSTEM = """You are a caption generation expert for autonomous driving scenes.

Generate a comprehensive structured caption based on the refined features provided.

Guidelines:
- scene_summary: Provide a concise 1-2 sentence overview
- ego_vehicle: Describe the ego vehicle's current action, lane position, and estimated speed
- objects: List ALL detected objects with their categories, positions, states, attributes, and visibility
- road_structure: Describe the road type, number of lanes, and visible markings
- environment: Specify lighting, weather, and location type
- safety_critical: List any safety-relevant observations (close objects, hazards, etc.)

Be precise, comprehensive, and factual based on the features provided."""

_MQA_SYSTEM = """You are an expert at answering questions about driving scenes.

Answer using the structured caption and features available.

Follow the nuScenes-MQA format strictly:
- Use XML tags:
  - <target>: Encapsulates <cnt> and <obj>
  - <obj>: Object name (single word or short phrase)
  - <cnt>: Count (number)
  - <ans>: Binary response (yes/no)
  - <cam>: Camera name (front, back, front left, etc.)
  - <dst>: Distance description
  - <loc>: Location coordinates (x, y)

Examples:
Q: "How many <obj>cars</obj> are in <cam>front</cam>?"
A: "There are <target><cnt>2</cnt> <obj>cars</obj></target>."

Q: "Is there a <obj>pedestrian</obj> in <cam>front left</cam>?"
A: "<ans>yes</ans>, there is <target><cnt>1</cnt> <obj>pedestrian</obj></target>."

Be precise with counts and use the exact XML format."""


_CAM_DIRECTIONS = ["front", "front left", "front right",
                   "back", "back left", "back right"]

# interned template specs: the engine's FSM cache keys by id(schema), so
# the SAME dict object must come back for the same (family, obj) — one
# compiled token table per distinct template (~5 families x ~9 objects)
_MQA_RF_CACHE: Dict[tuple, Optional[dict]] = {}


def mqa_response_format(question: str) -> Optional[dict]:
    """Constrained-decode template for an MQA answer (None = free text).

    The MQA answer contract is a rigid tag template (data/mqa.py:117-190)
    in which only the count / yes-no / direction / coordinate slots carry
    information — the <obj> echo, the tag skeleton, and the glue text are
    deterministic functions of the QUESTION.  Constraining the decode to
    the template (serving/structured.py template automata) makes those
    parts retrieval instead of generation: the r13 held-out decomposition
    measured 63/360 failures with the RIGHT count but a wrong object echo
    or malformed tags, plus 46 with a garbled/missing <cnt> — the format
    failure class this eliminates.  The model still chooses every
    informative slot.  Enabled by ModelConfig.mqa_template
    (MSC_MQA_TEMPLATE=1); the reference's counterpart surface is the
    response_format JSON the GPT-4o path constrains with
    (`src/agents/base_agent.py:27-34`)."""
    m = re.search(r"How many <obj>(.+?)</obj> are in", question)
    if m:
        key = ("count", m.group(1))
        if key not in _MQA_RF_CACHE:
            _MQA_RF_CACHE[key] = {"type": "template", "parts": [
                {"lit": "There are <target><cnt>"},
                {"type": "count", "maxDigits": 3},
                {"lit": f"</cnt> <obj>{key[1]}</obj></target>."},
            ]}
        return _MQA_RF_CACHE[key]
    m = re.search(r"Is there a <obj>(.+?)</obj>", question)
    if m:
        obj = m.group(1)
        plural = obj if obj.endswith("s") else obj + "s"
        key = ("existence", obj)
        if key not in _MQA_RF_CACHE:
            # yes <=> count>=1 by construction: the two branches share
            # the "<ans>" prefix (factored into the leading literal) and
            # diverge on 'y'/'n'; the no-branch hard-wires <cnt>0
            _MQA_RF_CACHE[key] = {"type": "template", "parts": [
                {"lit": "<ans>"},
                {"type": "oneof", "options": [
                    {"type": "template", "parts": [
                        {"lit": "yes</ans>, there are <target><cnt>"},
                        {"type": "count", "maxDigits": 3, "min1": True},
                    ]},
                    {"lit": "no</ans>, there are <target><cnt>0"},
                ]},
                {"lit": f"</cnt> <obj>{plural}</obj></target>."},
            ]}
        return _MQA_RF_CACHE[key]
    # The camera/distance/location automata each carry BOTH answer
    # branches the curriculum emits (serving/analytic.py
    # _format_mqa_answer): the present-object form AND the absent-object
    # form ("No camera shows...", "There is no ... visible...",
    # "...is unknown.").  Without the absent branch a caption lacking
    # the object would force the model to fabricate a value (round-4
    # advisor finding).  oneof branches must diverge in their first
    # byte, so shared prefixes are factored into leading literals.
    m = re.search(r"Which camera shows the nearest <obj>(.+?)</obj>",
                  question)
    if m:
        key = ("camera", m.group(1))
        if key not in _MQA_RF_CACHE:
            # branches diverge 'T' (present) / 'N' (absent)
            _MQA_RF_CACHE[key] = {"type": "oneof", "options": [
                {"type": "template", "parts": [
                    {"lit": f"The <obj>{key[1]}</obj> appears in the "
                            "<cam>"},
                    {"type": "choice", "values": _CAM_DIRECTIONS},
                    {"lit": "</cam> camera."},
                ]},
                {"lit": f"No camera shows a <obj>{key[1]}</obj>."},
            ]}
        return _MQA_RF_CACHE[key]
    m = re.search(r"How far away is the nearest <obj>(.+?)</obj>", question)
    if m:
        key = ("distance", m.group(1))
        if key not in _MQA_RF_CACHE:
            # shared "The" factored out; branches diverge ' ' / 'r'
            _MQA_RF_CACHE[key] = {"type": "template", "parts": [
                {"lit": "The"},
                {"type": "oneof", "options": [
                    {"type": "template", "parts": [
                        {"lit": f" nearest <obj>{key[1]}</obj> is <dst>"},
                        {"type": "decimal1", "maxDigits": 3},
                        {"lit": "m</dst> away."},
                    ]},
                    {"lit": f"re is no <obj>{key[1]}</obj> visible to "
                            "measure a distance to."},
                ]},
            ]}
        return _MQA_RF_CACHE[key]
    m = re.search(r"Where is the nearest <obj>(.+?)</obj>", question)
    if m:
        key = ("location", m.group(1))
        if key not in _MQA_RF_CACHE:
            coord = {"type": "decimal1", "maxDigits": 3, "signed": True}
            # shared "The " factored out; branches diverge 'n' / 'l'
            _MQA_RF_CACHE[key] = {"type": "template", "parts": [
                {"lit": "The "},
                {"type": "oneof", "options": [
                    {"type": "template", "parts": [
                        {"lit": f"nearest <obj>{key[1]}</obj> is at "
                                "<loc>("},
                        coord, {"lit": ", "}, dict(coord),
                        {"lit": ")</loc>."},
                    ]},
                    {"lit": f"location of the <obj>{key[1]}</obj> is "
                            "unknown."},
                ]},
            ]}
        return _MQA_RF_CACHE[key]
    return None


def build_mqa_messages(question: str, structured_caption: Dict) -> list:
    """The ONE canonical MQA prompt (messages list).

    Shared by the serial path (``answer_mqa_question``), the batched path
    (``pipeline.answer_mqa_batch``), and the self-distillation dataset
    builder (``training/distill.py``) — any drift between them means the
    model is evaluated on a prompt format it was never trained on.
    """
    # scene info first, question LAST: prompts longer than the context
    # window tail-truncate, and the question must survive.  Compact JSON:
    # ~40% fewer prompt tokens than indent=2, and the format matches what
    # the model itself emits under the constrained decoder (transfer)
    from msc_tpu.serving.analytic import question_facts
    from msc_tpu.utils.markers import strip_marker_lines

    # question-adjacent retrieval: the asked category's counts, computed
    # from the HOST-injected markers by the same matching core the
    # analytic teacher answers with — deterministic retrieval on the
    # host, language on the model.  Computed BEFORE the record lists are
    # stripped below (the markers are the authoritative fact source).
    facts = question_facts(question, structured_caption)
    facts_line = f"{facts}\n" if facts else ""

    # The embedded caption carries NO raw record lists: round-3 held-out
    # measurement showed the model answers count questions by counting
    # the prompt's JSON record entries — a skill it performs at ~50-60%
    # at scene scale (and record/fact consistency-by-construction means
    # no curriculum can train it away) — while the host fact line and
    # COUNTS tally it should read already carry every number.  Dropping
    # the records (objects array + *_JSON marker lines) leaves retrieval
    # as the only strategy and halves the prompt.  Prompt-only: the
    # pipeline's result-dict caption is untouched.
    reduced = {k: v for k, v in structured_caption.items() if k != "objects"}
    if "full_caption" in reduced:
        reduced["full_caption"] = strip_marker_lines(
            str(reduced["full_caption"]))
    user = (f"Scene Information:\n"
            f"{json.dumps(reduced, separators=(',', ':'))}\n\n"
            f"Question: {question}\n"
            f"{facts_line}"
            "Provide a precise answer using the correct XML format.")
    return [{"role": "system", "content": _MQA_SYSTEM},
            {"role": "user", "content": user}]


class CaptionGenerator(BaseAgent):
    """Generates final structured captions and answers MQA questions."""

    # constrained MQA decode (ModelConfig.mqa_template); the pipeline
    # sets this after construction so serial and batched paths agree
    mqa_template: bool = False

    def generate_structured_caption(self, refined_caption: str) -> Dict[str, Any]:
        user = (f"Generate a structured caption from this refined caption:\n\n"
                f"{refined_caption}\n\nCreate a complete, accurate caption "
                "covering all aspects of the scene.")
        messages = [{"role": "system", "content": _CAPTION_SYSTEM},
                    {"role": "user", "content": user}]
        try:
            response = self.call_llm(messages, temperature=0.3,
                                     response_format=StructuredCaption,
                                     task="structure_caption")
            caption_dict = response.model_dump()
            # full_caption injection (parity caption_agent.py:90) + the
            # host-computed COUNTS_JSON tally (utils/markers.py) so MQA
            # count answers are a lookup, not model arithmetic
            from msc_tpu.utils.markers import append_counts

            caption_dict["full_caption"] = append_counts(refined_caption)
            return {"agent": self.agent_name,
                    "structured_caption": caption_dict}
        except Exception as e:
            # minimal fallback caption (parity caption_agent.py:94-122)
            print(f"  [CaptionGenerator] error: {e}")
            return {
                "agent": self.agent_name,
                "structured_caption": {
                    "scene_summary": "Error generating caption",
                    "full_caption": "Error generating caption",
                    "ego_vehicle": {"action": "unknown",
                                    "lane_position": "unknown",
                                    "speed_estimate": "unknown"},
                    "objects": [],
                    "road_structure": {"type": "unknown", "lanes": "unknown",
                                       "markings": []},
                    "environment": {"lighting": "unknown",
                                    "weather": "unknown",
                                    "location_type": "unknown"},
                    "safety_critical": ["Caption generation failed"],
                },
                "parse_error": True,
                "error_message": str(e),
            }

    def answer_mqa_question(self, question: str,
                            structured_caption: Dict) -> str:
        messages = build_mqa_messages(question, structured_caption)
        try:
            return self.call_llm(messages, temperature=0.0, task="mqa_answer",
                                 max_new_tokens=64,
                                 response_format=(
                                     mqa_response_format(question)
                                     if self.mqa_template else None))
        except Exception as e:
            print(f"  [CaptionGenerator] MQA error: {e}")
            return "Error: Unable to answer question"
