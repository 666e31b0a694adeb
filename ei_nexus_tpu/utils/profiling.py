"""First-class tracing and per-step timing.

The reference has no profiling at all (SURVEY.md §5). This module provides:
 - `trace(path)`: context manager around `jax.profiler` emitting a
   TensorBoard-viewable XPlane trace of the enclosed device work;
 - `StepTimer`: wall-clock per-step timing with completion forcing and
   rolling statistics — used by the trainers' status lines;
 - `annotate`: named trace spans (jax.profiler.TraceAnnotation) for
   attributing device time to pipeline stages.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into `log_dir` (TensorBoard 'profile' tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for attributing device time (usable as ctx manager)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step wall-clock stats.

    Call `tic()` before dispatch and `toc(result)` after: `toc` blocks on
    the result pytree so async dispatch doesn't hide device time (remote
    backends may acknowledge at enqueue; pass `fetch=True` to force a
    device->host read of one leaf for a hard completion bound).
    """

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self, result=None, fetch: bool = False) -> float:
        if result is not None:
            if fetch:
                leaves = jax.tree_util.tree_leaves(result)
                if leaves:
                    np.asarray(jax.device_get(leaves[0]))
            else:
                jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        self._t0 = None
        return dt

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / max(arr.mean(), 1e-9)),
        }
