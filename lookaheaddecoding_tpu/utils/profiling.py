"""Profiling helpers.

The reference's only instrumentation is wall-clock timing around generate
(SURVEY.md §5: "Tracing / profiling: none beyond time.time()"); here decode
runs can capture full XLA device traces for tensorboard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace of the enclosed block:

        with profiling.trace("/tmp/lade_trace"):
            eng.generate(ids, 256)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight wall-clock step accounting for streaming loops."""

    def __init__(self):
        self.times = []
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t)

    @property
    def mean_ms(self) -> float:
        return 1000 * sum(self.times) / max(len(self.times), 1)
