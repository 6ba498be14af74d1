"""Profiling / tracing hooks (SURVEY §5: absent in the reference).

- ``trace(logdir)``: jax.profiler trace context (TensorBoard-compatible);
- ``StepTimer``: wall-clock step timing with ``block_until_ready``
  semantics for honest device timings;
- ``timed(fn)``: one-shot timing helper returning (result, seconds).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall-clock with device completion barriers.

    >>> timer = StepTimer()
    >>> with timer.step():
    ...     out = train_step(...)        # timer blocks on out at exit
    """

    def __init__(self):
        self.times = []
        self._out = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield self
        if self._out is not None:
            jax.block_until_ready(self._out)
            self._out = None
        self.times.append(time.perf_counter() - t0)

    def observe(self, out):
        """Register device output to block on at step exit."""
        self._out = out
        return out

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> str:
        if not self.times:
            return "no steps recorded"
        ts = sorted(self.times)
        p50 = ts[len(ts) // 2]
        return (f"steps={len(ts)} mean={self.mean*1e3:.2f}ms "
                f"p50={p50*1e3:.2f}ms max={ts[-1]*1e3:.2f}ms")


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10):
    """(result, secs_per_call) with compile excluded and device barriers."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / iters
