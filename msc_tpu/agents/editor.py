"""EditorAgent: applies suggestions (Layer 3).

Behavior parity with `src/agents/refinement/editor_agent.py:14-93`: full
Layer-1 transformed_content as grounding context, RefinedFeaturesResponse
structured output, unchanged-caption fallback on error.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.schemas import RefinedFeaturesResponse, SuggestionResponse


class EditorAgent(BaseAgent):
    """Refines captions based on structured suggestions."""

    def refine(self, caption: str, suggestion_response: SuggestionResponse,
               transformed_content: Dict[str, Any],
               iteration: int = 1) -> Dict[str, Any]:
        system = f"""You are an expert editor who refines and improves feature descriptions.

This is refinement iteration {iteration}.

Apply the suggested improvements to create polished, comprehensive captions.
Ensure completeness, accuracy, clarity, consistency, and removal of redundancy.

CRITICAL INSTRUCTIONS:
- Include EVERY piece of information available - no summarization
- Be exhaustive and thorough - longer captions with more detail are better
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Preserve any machine-readable marker lines (OBJECTS_JSON / DETECTIONS_JSON) verbatim
- Write as if you're describing the scene to someone who can't see it"""

        suggestions_text = "\n".join(f"- {s}"
                                     for s in suggestion_response.suggestions)
        user = f"""Refine this caption based on the suggestions.:

Current Caption:
{caption}

Suggestions:
{suggestions_text}

Reasoning: {suggestion_response.reasoning}

To refine the caption, consider the full context from all sensors:
{json.dumps(transformed_content, indent=2)}

Provide a refined caption and list all changes made."""

        messages = [{"role": "system", "content": system},
                    {"role": "user", "content": user}]
        try:
            response = self.call_llm(messages, temperature=0.5,
                                     response_format=RefinedFeaturesResponse,
                                     task="edit")
            return {"refined_caption": response.caption,
                    "changes_made": response.changes_made}
        except Exception as e:
            # fallback: caption unchanged (parity editor_agent.py:87-93)
            print(f"  [Editor] error, returning unchanged caption: {e}")
            return {"refined_caption": caption,
                    "changes_made": ["Error occurred, no changes applied"]}
