"""SuggesterAgent: structured critique (Layer 3).

Behavior parity with `src/agents/refinement/suggester_agent.py:18-77`:
iteration-aware prompt, SuggestionResponse structured output.
"""

from __future__ import annotations

from msc_tpu.agents.base import BaseAgent
from msc_tpu.agents.schemas import SuggestionResponse


class SuggesterAgent(BaseAgent):
    """Reviews a caption and returns structured improvement suggestions."""

    def suggest(self, caption: str, iteration: int = 1) -> SuggestionResponse:
        if iteration == 1:
            context = "This is the first review of the initial features."
        else:
            context = (f"This is iteration {iteration}. "
                       "Focus on remaining issues only.")
        system = f"""You are a quality assurance expert who reviews and suggests improvements.

{context}

Analyze the features and suggest improvements focusing on:
- Missing information that should be included
- Redundant or unclear descriptions
- Inconsistencies between different aspects
- Areas needing more detail or precision

IMPORTANT:
- If the features are already high quality and comprehensive, set has_suggestions to false
- Be specific and constructive; only suggest meaningful improvements
- Avoid nitpicking minor issues if overall quality is good"""
        user = (f"Review this caption (Iteration {iteration}):\n\n{caption}\n\n"
                "Analyze and provide structured suggestions. If features are "
                "comprehensive, set has_suggestions to false and explain why.")
        messages = [{"role": "system", "content": system},
                    {"role": "user", "content": user}]
        return self.call_llm(messages, temperature=0.6,
                             response_format=SuggestionResponse,
                             task="suggest")
