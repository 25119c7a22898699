"""Profiling helpers (SURVEY §5.1).

The reference's only profiling is a forward-hook FLOP tally
(utils/utils.py:713-829) and dead wall-clock probes (uniposeLSTM.py:123).
TPU-native: ``jax.profiler`` traces viewable in TensorBoard/Perfetto plus a
simple wall-clock timer for steady-state step timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/unipose_tpu_trace") -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/t'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timing, excluding the first ``skip`` (compile)
    steps."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def rate(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else float("nan")
