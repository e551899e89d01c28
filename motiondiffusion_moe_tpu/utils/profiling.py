"""Tracing / profiling utilities.

The reference's observability is wall-clock prints only (SURVEY.md §5:
"Tracing / profiling: ABSENT"). TPU-native equivalents:

- :func:`trace` — context manager around ``jax.profiler.trace``; dumps an
  XProf/TensorBoard trace directory for any code region.
- :func:`annotate` — named ``TraceAnnotation`` region so steps show up as
  labeled spans inside the trace.
- :class:`StepTimer` — cheap wall-clock percentile timer for steady-state
  step-time tracking without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a profiler trace of the enclosed region to ``log_dir``
    (view with TensorBoard's profile plugin / XProf)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a profiler trace:
    ``with annotate('train_step'): ...``"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentiles (blocks on device work)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> dict:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "max_s": float(arr.max()),
        }
