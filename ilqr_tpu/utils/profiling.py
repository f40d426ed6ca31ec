"""Profiling hooks: jax.profiler traces and phase timers.

The reference has no profiling at all (SURVEY.md §5).  These are thin,
dependency-free wrappers so benchmark and production code annotate the
solver's phases consistently and can capture device traces for analysis in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a block."""

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device traces (jax.profiler annotation)."""

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Host-side wall-clock phase accumulator (blocks on device results).

    Example::

        timer = PhaseTimer()
        with timer.phase("backward"):
            out = jax.block_until_ready(bwd_fn(...))
        print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        rows = [
            f"{name}: {total*1e3:.2f} ms over {self.counts[name]} calls"
            for name, total in sorted(self.totals.items())
        ]
        return "\n".join(rows)
