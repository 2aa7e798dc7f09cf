"""BaseAgent: the per-agent handle on the model-call seam.

Parity with reference `src/agents/base_agent.py:6-58`, except retry/backoff
lives in ``ChatClient`` (one implementation instead of the reference's
duplicated copy at `src/baseline_gpt4o.py:329-371`, which also carries the
`self.agent_name` bug we do not reproduce).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from msc_tpu.serving.client import ChatClient


class BaseAgent:
    """Base class for all agents."""

    def __init__(self, client: ChatClient, model: str, agent_name: str):
        self.client = client
        self.model = model
        self.agent_name = agent_name

    def call_llm(self, messages: List[dict], temperature: float = 0.7,
                 max_retries: int = 8, response_format: Any = None,
                 task: Optional[str] = None,
                 images: Sequence[np.ndarray] = (),
                 max_new_tokens: Optional[int] = None) -> Any:
        return self.client.call_llm(
            messages, temperature=temperature, max_retries=max_retries,
            response_format=response_format, task=task, images=images,
            max_new_tokens=max_new_tokens)
