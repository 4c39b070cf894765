"""Profiling / tracing hooks.

Reference behavior: torch.profiler ``record_function("load_data") /
record_function("model_inference")`` scopes around the NR train loop
(train-nr.py:273,280; the enclosing profile() context is committed
disabled). TPU equivalent: jax.profiler traces + named scopes, enabled by
env var or explicitly — so the default path stays zero-overhead, like the
reference's dormant hooks.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

import jax

TRACE_ENV = "NERF_QA_TPU_TRACE_DIR"


@contextlib.contextmanager
def trace_if_enabled(trace_dir: str | None = None) -> Iterator[None]:
    """jax.profiler trace context; no-op unless a dir is given or
    NERF_QA_TPU_TRACE_DIR is set. View with tensorboard/xprof."""
    trace_dir = trace_dir or os.environ.get(TRACE_ENV)
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def record_function(name: str):
    """Named scope for device ops + host wall-time, composable as a
    context manager (the record_function("load_data"/"model_inference")
    equivalent)."""
    return _RecordScope(name)


class _RecordScope:
    def __init__(self, name: str):
        self.name = name
        self.elapsed: float | None = None

    def __enter__(self):
        self._scope = jax.named_scope(self.name)
        self._scope.__enter__()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return self._scope.__exit__(*exc)


class StepTimer:
    """Rolling step-time tracker for throughput logs (tqdm-equivalent
    observability in headless runs)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def rate(self, items_per_step: int = 1) -> float:
        return items_per_step / self.mean if self.mean else 0.0
