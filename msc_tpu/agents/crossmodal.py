"""CrossModalAgent: inter-agent information exchange (Layer 1 tail).

Behavior parity with `src/agents/content_transform/crossmodal_agent.py:5-50`:
one text call over the {agent -> observations} map asking for
contradictions / complementary info / synthesis.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

from msc_tpu.agents.base import BaseAgent

_SYSTEM_PROMPT = """You are a coordination expert who facilitates information exchange.
Review outputs from multiple perception agents and:
- Identify complementary information
- Resolve contradictions
- Highlight important cross-modal insights
- Suggest areas needing attention
- Create summary of multi-modal understanding

CRITICAL INSTRUCTIONS:
- Include EVERY NEW piece of information available that's not already mentioned
- Be exhaustive and thorough - longer captions with more detail are better
- Don't say "various objects" or "several vehicles" - name each one specifically
- Include all numerical data (distances, counts, positions)
- Write as if you're describing the scene to someone who can't see it"""


class CrossModalAgent(BaseAgent):
    """Facilitates information sharing between agents."""

    def facilitate_exchange(self, agent_outputs: List[Dict]) -> Dict[str, Any]:
        response = self.call_llm(**self.prepare_call(agent_outputs))
        return self.finish(response)

    def prepare_call(self, agent_outputs: List[Dict]) -> dict:
        """The synthesis call as a spec (fused-path seam)."""
        summaries = {out["agent"]: out.get("observations", "")
                     for out in agent_outputs}
        user = (f"Review and synthesize these agent observations:\n\n"
                f"{json.dumps(summaries, indent=2)}\n\n"
                "Provide a coordinated summary highlighting key insights "
                "and any discrepancies.")
        messages = [
            {"role": "system", "content": _SYSTEM_PROMPT},
            {"role": "user", "content": user},
        ]
        return dict(messages=messages, temperature=0.4, task="crossmodal",
                    max_new_tokens=128)

    def finish(self, response: str) -> Dict[str, Any]:
        return {
            "agent": self.agent_name,
            "modality": "cross_modal",
            "observations": response,
        }
