"""Profiling hooks: jax.profiler traces + step timing.

The reference ships no tracing/profiling at all (SURVEY.md §5); the TPU
build's north-star metric is images/sec/chip, so the trainer exposes:
  - ``trace(logdir)``: context manager capturing a jax.profiler trace
    (viewable in TensorBoard / xprof);
  - ``StepTimer``: wall-clock step/images-per-second meter with warmup
    exclusion, used by the train loop and bench.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Images/sec meter excluding the first (compile) steps."""

    def __init__(self, warmup_steps: int = 2) -> None:
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._steps = 0
        self._images = 0
        self._t0: Optional[float] = None

    def step(self, batch_images: int) -> None:
        self._steps += 1
        if self._steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            return
        if self._steps > self.warmup_steps:
            self._images += batch_images

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        return self._images / max(time.perf_counter() - self._t0, 1e-9)
