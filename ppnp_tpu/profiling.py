"""Tracing / profiling: jax.profiler wrappers + step timers.

Reference analog: nothing — the reference only records wall-clock
``runtime``/``runtime_perepoch`` (SURVEY.md §5 "Tracing" row). Here:

- ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  perfetto/tensorboard-compatible traces of the jitted steps;
- ``annotate(name)`` — ``jax.named_scope`` pass-through so MLP / SpMM /
  exchange regions are labeled in traces and HLO;
- ``StepTimer`` — cheap wall-clock EMA of step time + derived SpMM GB/s
  (the BASELINE.json:2 metric) without host callbacks in the jitted path.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_trace: bool = False) -> Iterator[None]:
    """Profile everything inside the block into ``logdir``."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_trace=create_perfetto_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for trace/HLO labeling: ``with annotate("spmm"): ...``"""
    return jax.named_scope(name)


class StepTimer:
    """Wall-clock step timing with EMA and bandwidth derivation.

    Call ``tick()`` after each (blocked) step. ``gbps(bytes_per_step)``
    converts the EMA into effective bandwidth.
    """

    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self._last: Optional[float] = None
        self.ema_step_s: Optional[float] = None
        self.steps = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            if self.ema_step_s is None:
                self.ema_step_s = dt
            else:
                self.ema_step_s = (self._ema_coef * self.ema_step_s
                                   + (1 - self._ema_coef) * dt)
        self._last = now
        self.steps += 1
        return dt

    def gbps(self, bytes_per_step: int) -> Optional[float]:
        if not self.ema_step_s:
            return None
        return bytes_per_step / self.ema_step_s / 1e9
