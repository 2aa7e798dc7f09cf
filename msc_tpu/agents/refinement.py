"""IterativeRefinementController: suggest -> edit loop (Layer 3).

Behavior parity with `src/agents/refinement/refinement_controller.py:23-155`:
loop until the suggester reports no suggestions (convergence) or
max_iterations; per-iteration records; result dict with final_caption /
iterations / converged / total_iterations / convergence_iteration.
(The reference's stale __main__ demo at `:213-263` is a known-broken
artifact and is intentionally not reproduced.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

from msc_tpu.agents.editor import EditorAgent
from msc_tpu.agents.suggester import SuggesterAgent


@dataclasses.dataclass
class RefinementIteration:
    """One refinement pass (parity `refinement_controller.py:13-21`)."""

    iteration: int
    suggestions: List[str]
    has_suggestions: bool
    reasoning: str
    refined_caption: str
    changes_made: List[str]


class IterativeRefinementController:
    """Drives the suggest->edit loop until convergence."""

    def __init__(self, suggester: SuggesterAgent, editor: EditorAgent,
                 max_iterations: int = 5, verbose: bool = True,
                 fused: bool = False):
        """fused: one suggest+edit call per iteration instead of two
        (EditorAgent.suggest_and_refine; TPU-native call fusion — the
        convergence protocol and iteration records are unchanged)."""
        self.suggester = suggester
        self.editor = editor
        self.max_iterations = max_iterations
        self.verbose = verbose
        self.fused = fused
        self.iterations: List[RefinementIteration] = []

    def refine(self, seed_caption: str,
               transformed_content: Dict) -> Dict[str, Any]:
        if self.fused:
            return self._refine_fused(seed_caption, transformed_content)
        self.iterations = []
        current = seed_caption
        converged = False

        for iteration in range(1, self.max_iterations + 1):
            if self.verbose:
                print(f"--- Refinement iteration {iteration}/{self.max_iterations} ---")
            suggestion = self.suggester.suggest(current, iteration)
            record = RefinementIteration(
                iteration=iteration,
                suggestions=suggestion.suggestions,
                has_suggestions=suggestion.has_suggestions,
                reasoning=suggestion.reasoning,
                refined_caption=current,
                changes_made=[],
            )
            if not suggestion.has_suggestions:
                converged = True
                self.iterations.append(record)
                break
            refined = self.editor.refine(current, suggestion,
                                         transformed_content, iteration)
            # host-carry the marker lines through the edit (the
            # constrained editor cannot even emit double quotes; see
            # utils/markers.py)
            from msc_tpu.utils.markers import carry_markers

            current = carry_markers(refined["refined_caption"], [current])
            record.refined_caption = current
            record.changes_made = refined["changes_made"]
            self.iterations.append(record)

        return {
            "final_caption": current,
            "iterations": [dataclasses.asdict(r) for r in self.iterations],
            "converged": converged,
            "total_iterations": len(self.iterations),
            "convergence_iteration": len(self.iterations) if converged else None,
        }

    def _refine_fused(self, seed_caption: str,
                      transformed_content: Dict) -> Dict[str, Any]:
        self.iterations = []
        current = seed_caption
        converged = False

        for iteration in range(1, self.max_iterations + 1):
            if self.verbose:
                print(f"--- Refinement iteration {iteration}/"
                      f"{self.max_iterations} (fused) ---")
            step = self.editor.suggest_and_refine(current,
                                                  transformed_content,
                                                  iteration)
            record = RefinementIteration(
                iteration=iteration,
                suggestions=step.suggestions,
                has_suggestions=step.has_suggestions,
                reasoning=step.reasoning,
                refined_caption=current,
                changes_made=[],
            )
            if not step.has_suggestions or not step.caption.strip():
                converged = True
                self.iterations.append(record)
                break
            from msc_tpu.utils.markers import carry_markers

            current = carry_markers(step.caption, [current])
            record.refined_caption = current
            record.changes_made = step.changes_made
            self.iterations.append(record)

        return {
            "final_caption": current,
            "iterations": [dataclasses.asdict(r) for r in self.iterations],
            "converged": converged,
            "total_iterations": len(self.iterations),
            "convergence_iteration": len(self.iterations) if converged else None,
        }

    def get_summary(self) -> str:
        """Parity with `refinement_controller.py:157-182`."""
        if not self.iterations:
            return "No iterations performed yet"
        lines = ["REFINEMENT SUMMARY",
                 f"Total iterations: {len(self.iterations)}", ""]
        for r in self.iterations:
            lines.append(f"Iteration {r.iteration}:")
            lines.append(f"  - Suggestions: {len(r.suggestions)}")
            lines.append(f"  - Has suggestions: {r.has_suggestions}")
            lines.append(f"  - Reasoning: {r.reasoning}")
            lines.append(f"  - Changes made: {len(r.changes_made)}")
            if not r.has_suggestions:
                lines.append("  - CONVERGED")
        return "\n".join(lines)


def create_iterative_refinement_system(client, model: str,
                                       max_iterations: int = 5,
                                       verbose: bool = True):
    """Factory (parity `refinement_controller.py:186-209`)."""
    return IterativeRefinementController(
        SuggesterAgent(client, model, "Suggester"),
        EditorAgent(client, model, "Editor"),
        max_iterations=max_iterations, verbose=verbose)
