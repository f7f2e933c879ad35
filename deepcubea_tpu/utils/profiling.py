"""Tracing / profiling utilities (SURVEY.md §5).

The reference's observability is manual wall-clock phase timers — the
Python A* accumulates {pop, expand, check, heur, add, itr} per step
(astar.py:239-240, 309-317), the C++ binary prints per-iteration phase
times (cpp:323-327). Here one search iteration is a single fused device
program, so intra-step phases are not separately timeable from the host;
instead this module provides:

  - PhaseTimer: the same accumulate-and-report counter object for host-side
    phases (dispatch, host loops, IO), printed in the reference's format;
  - trace(): a context manager around `jax.profiler.trace` that captures a
    full XLA trace (TensorBoard-viewable) of whatever runs inside — the
    TPU-native way to see the per-op breakdown the reference's timers
    approximate.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class PhaseTimer:
    """Accumulating named phase timer (reference astar.py:239-240)."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.times.values())
        parts = [f"{k}: {v:.2f}" for k, v in sorted(self.times.items())]
        return f"Times - {', '.join(parts)}, total: {total:.2f}"


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
