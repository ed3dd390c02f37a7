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


def test_initialize_from_env(monkeypatch):
    """The CLI's multi-host bootstrap: no env -> no-op; full env ->
    jax.distributed.initialize with the parsed launcher config; partial
    env -> loud error (a silently single-host 'pod' duplicates data)."""
    import pytest

    from ergm_tpu.parallel import distributed

    assert distributed.initialize_from_env({}) is None

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    env = {"ERGM_COORDINATOR": "10.0.0.1:1234",
           "ERGM_NUM_PROCESSES": "4", "ERGM_PROCESS_ID": "2"}
    info = distributed.initialize_from_env(env)
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]
    assert info["process_count"] == 1  # single-process jax under the mock

    with pytest.raises(ValueError, match="Partial multi-host"):
        distributed.initialize_from_env({"ERGM_COORDINATOR": "x:1"})
