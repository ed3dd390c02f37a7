"""Profiling / tracing utilities.

The reference has no tracing beyond tqdm progress bars (SURVEY.md §5
tracing row; src/main.py:137, 216, 302). Here: named trace annotations
that show up in TPU profiler timelines, a capture context writing
TensorBoard-profile-plugin traces, and a step timer whose completion
barrier is a device->host fetch (``jax.block_until_ready`` is not
reliable through tunneled device transports — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device profile (XPlane trace annotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture(logdir: str) -> Iterator[None]:
    """Capture a device trace into ``logdir`` for the TensorBoard profile
    plugin (tensorboard --logdir <logdir>)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9012):
    """On-demand profiling endpoint (connect with TensorBoard capture)."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Wall-clock step timer with a fetch-based completion barrier.

    >>> timer = StepTimer()
    >>> with timer.step(fetch=lambda: metrics["loss"]):
    ...     state, metrics = train_step(state, batch, rng)
    >>> timer.summary()  # {'mean_s': ..., 'p50_s': ..., 'steps_per_s': ...}
    """

    def __init__(self):
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, fetch=None):
        t0 = time.perf_counter()
        yield
        if fetch is not None:
            np.asarray(jax.device_get(fetch()))
        self.times.append(time.perf_counter() - t0)

    def summary(self, skip_first: int = 1) -> dict:
        ts = self.times[skip_first:] if len(self.times) > skip_first else self.times
        if not ts:
            return {}
        arr = np.asarray(ts)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }
