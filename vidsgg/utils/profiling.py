"""Profiling & timing hooks.

The reference's only observability is wall-clock prints
(TEMPURA_train.py:233-235). Here: a phase timer registry plus
``jax.profiler`` trace capture for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimers:
    """Accumulates wall-clock per named phase; remember that device work is
    async — wrap the timed region's outputs in a host sync (float()) to
    attribute time correctly."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1000.0 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(log_dir):
    """`trace` when a directory is given, no-op otherwise.

    Backs the CLIs' ``--profile DIR`` flag: the whole train/eval run is
    captured as one jax.profiler trace for TensorBoard/XProf.
    """
    if not log_dir:
        yield
    else:
        with trace(log_dir):
            yield
