"""EditorAgent: applies suggestions (Layer 3).

Behavior parity with `src/agents/refinement/editor_agent.py:14-93`: full
Layer-1 transformed_content as grounding context, RefinedFeaturesResponse
structured output, unchanged-caption fallback on error.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.schemas import (RefinedFeaturesResponse,
                                    RefineStepResponse, SuggestionResponse)


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

    def suggest_and_refine(self, caption: str,
                           transformed_content: Dict[str, Any],
                           iteration: int = 1) -> RefineStepResponse:
        """Fused suggest+edit: ONE constrained call critiques the caption
        and applies its own suggestions (call-count lever; see
        RefineStepResponse).  The prompt keeps both agents' instruction
        content — the suggester's review criteria and the editor's
        grounding context."""
        if iteration == 1:
            context = "This is the first review of the caption."
        else:
            context = (f"This is iteration {iteration}. "
                       "Focus on remaining issues only.")
        system = f"""You are a quality assurance expert AND editor who reviews captions, suggests improvements, and applies them.

{context}

First decide whether the caption needs improvement, focusing on:
- Missing information that should be included
- Redundant or unclear descriptions
- Inconsistencies between different aspects
- Areas needing more detail or precision

IMPORTANT:
- If the caption is already high quality and comprehensive, set has_suggestions to false, leave caption empty, and explain why
- Otherwise list specific suggestions AND emit the refined caption applying them

CRITICAL INSTRUCTIONS for the refined caption:
- Include EVERY piece of information available - no summarization
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Write as if you're describing the scene to someone who can't see it"""

        user = f"""Review and refine this caption (Iteration {iteration}):

Current Caption:
{caption}

To refine the caption, consider the full context from all sensors:
{json.dumps(transformed_content, indent=2)}

If improvements are needed, provide the suggestions, the refined caption, and all changes made; otherwise set has_suggestions to false."""

        messages = [{"role": "system", "content": system},
                    {"role": "user", "content": user}]
        try:
            return self.call_llm(messages, temperature=0.5,
                                 response_format=RefineStepResponse,
                                 task="refine_step")
        except Exception as e:
            # fallback: converge with the caption unchanged (the serial
            # path's editor fallback semantics, editor_agent.py:87-93)
            print(f"  [Editor] refine_step error, keeping caption: {e}")
            return RefineStepResponse(
                has_suggestions=False, suggestions=[],
                reasoning=f"Refinement error: {e}"[:160],
                caption="", changes_made=[])
