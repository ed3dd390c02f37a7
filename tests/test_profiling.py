"""Profiling utilities: annotations, trace capture, step timing,
distributed no-op init."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ergm_tpu.utils.profiling import StepTimer, annotate, capture


def test_annotate_and_capture(tmp_path):
    x = jnp.ones((64, 64))
    f = jax.jit(lambda a: a @ a)
    _ = f(x)
    with capture(str(tmp_path)):
        with annotate("matmul-under-test"):
            np.asarray(f(x))
    traces = glob.glob(str(tmp_path / "**" / "*.trace.json.gz"), recursive=True)
    assert traces, "no trace written"
    assert os.path.getsize(traces[0]) > 0


def test_step_timer():
    timer = StepTimer()
    x = jnp.ones((32, 32))
    f = jax.jit(lambda a: a @ a)
    for _ in range(4):
        with timer.step(fetch=lambda: y):
            y = f(x)
    s = timer.summary()
    assert s["steps"] == 3  # first skipped
    assert s["mean_s"] > 0 and s["steps_per_s"] > 0
    assert s["p95_s"] >= s["p50_s"]


def test_distributed_noop_and_primary():
    from ergm_tpu.parallel.distributed import initialize, is_primary

    info = initialize()
    assert info["process_count"] == 1
    assert is_primary()
