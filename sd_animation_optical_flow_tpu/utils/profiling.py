"""Tracing / profiling subsystem.

The reference has none (SURVEY §5: tqdm + stray prints only). Here:
  * ``stage(name)`` — per-stage wall timers collected into a registry
    (the pipeline-level observability the reference lacked);
  * ``trace(dir)`` — jax.profiler trace context for TensorBoard/XProf;
  * ``annotate(name)`` — device-side named regions (shows in traces).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimer:
    """Accumulates wall time + call counts per pipeline stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "calls": self.counts[k],
                    "mean_s": round(self.totals[k] / max(self.counts[k], 1),
                                    4)}
                for k in sorted(self.totals)}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


GLOBAL_TIMER = StageTimer()
stage = GLOBAL_TIMER.stage


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace window (open with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named device-side region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
