"""Profiling & step timing hooks (SURVEY.md §6 "Tracing / profiling"):
jax.profiler trace annotations + a block_until_ready-bracketed step timer
for images/sec. Zero cost when disabled."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Capture an xprof trace viewable in TensorBoard when `logdir` set."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: call `tick(metrics)` each step; the first
    `warmup` ticks (compile) are excluded from the rate."""

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self._count = 0
        # warmup=0: no excluded steps — the clock starts immediately
        # (tick()'s count==warmup trigger can never fire post-increment)
        self._t0 = time.perf_counter() if warmup == 0 else None
        self._timed_steps = 0

    def tick(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            self._timed_steps = 0
        elif self._count > self.warmup:
            self._timed_steps += 1

    @property
    def warming_up(self) -> bool:
        """True until the tick that starts the clock. Callers that want an
        async hot loop should pass `result` only while this is True (the
        clock then starts from a clean synced point) and ensure a
        block/`device_get` happens before *reading* the rates — e.g. the
        train loop's log-boundary metrics fetch."""
        return self._count < self.warmup

    @property
    def images_per_sec(self) -> float:
        if not self._t0 or not self._timed_steps:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._timed_steps * self.batch_size / dt

    @property
    def sec_per_step(self) -> float:
        if not self._t0 or not self._timed_steps:
            return 0.0
        return (time.perf_counter() - self._t0) / self._timed_steps
