"""Profiling / tracing helpers.

The reference has no profiler integration (SURVEY.md §5 — wall-clock
meters only).  TPU-native equivalent: jax.profiler traces viewable in
TensorBoard/Perfetto, named step annotations, and a simple wall-clock
section timer for host-side stages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with: tensorboard --logdir <log_dir> (profile plugin) or load the
    .trace.json.gz into Perfetto.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range inside a trace (shows up on the TPU timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class SectionTimer:
    """Host-side named section timing with summary()."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": tot, "count": self.counts[name],
                   "mean_ms": 1000.0 * tot / self.counts[name]}
            for name, tot in self.totals.items()
        }
