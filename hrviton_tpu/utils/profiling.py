"""Profiling / tracing hooks (SURVEY.md §5: the reference has wall-clock prints
only; we provide jax.profiler traces + per-step timing).

Usage:
  with trace_if("/tmp/trace"):          # no-op when dir is falsy
      step(...)
  timer = StepTimer(); ...; timer.lap()
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["trace_if", "StepTimer"]


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str]):
    """jax.profiler.trace wrapper that no-ops when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class StepTimer:
    """Wall-clock per-interval timing (reference prints time per
    display_count, train_condition.py:134,440)."""

    def __init__(self):
        self._t0 = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self._t0
        self._t0 = now
        return dt
