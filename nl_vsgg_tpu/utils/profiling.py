"""Tracing / profiling helpers (the reference has none — SURVEY.md §5).

`phase_timer` collects wall-clock per named phase (grounding, train_step,
eval, ...) with running averages; `trace` wraps jax.profiler for on-demand
TPU traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: total {t:.2f}s, {c} calls, "
                         f"avg {1e3 * t / max(c, 1):.1f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope; open the logdir with TensorBoard."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
