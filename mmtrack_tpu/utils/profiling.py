"""Profiling helpers.

The reference's telemetry is wall-clock counters around data/forward
(ltr_trainer.py:130-136) and per-sequence FPS prints plus SPT's
profile_model.py scripts (SURVEY.md section 5.1). TPU-native, the deep tool
is jax.profiler: `trace_profile` captures a TensorBoard-viewable trace of
device execution; `Timer` keeps the cheap wall-clock counters.
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Accumulating wall-clock timer (AverageMeter for time)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args) -> float | None:
    """XLA cost-analysis FLOPs of a jitted callable (profile_model analog)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return None
