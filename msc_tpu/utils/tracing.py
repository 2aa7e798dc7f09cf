"""Per-stage timing + optional jax.profiler traces.

Greenfield subsystem (the reference has no tracing/profiling at all —
SURVEY.md section 5: progress is bare prints, the only timing is one
wall-clock delta around the whole sweep)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional


class StageTimer:
    """Accumulates wall-clock durations per named stage."""

    def __init__(self):
        self.durations: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ds in self.durations.items():
            out[name] = {
                "count": len(ds),
                "total_s": sum(ds),
                "mean_ms": sum(ds) / len(ds) * 1000.0,
                "max_ms": max(ds) * 1000.0,
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<32} {'count':>6} {'mean ms':>10} {'total s':>9}"]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{name:<32} {s['count']:>6} "
                         f"{s['mean_ms']:>10.1f} {s['total_s']:>9.2f}")
        return "\n".join(lines)

    def reset(self):
        self.durations.clear()


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """Wrap a region in a jax.profiler trace when logdir is given."""
    if logdir:
        import jax

        with jax.profiler.trace(logdir):
            yield
    else:
        yield
