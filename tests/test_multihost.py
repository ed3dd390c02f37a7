"""Multi-host (2-process) execution proof — SURVEY.md §2.3's DCN row,
VERDICT round-1 item 5. Two OS processes, each with 2 virtual CPU
devices, run one sharded training flow end-to-end:

- jax.distributed.initialize over a localhost coordinator,
- per-host dataset sharding (equal-length shards),
- global batches assembled from process-local data,
- jitted train steps with the gradient all-reduce spanning processes,
- a COLLECTIVE orbax checkpoint save + restore.

Asserted: both processes compute identical losses each step (the global
batch is consistent and grads are fully reduced) and the checkpoint
round-trips."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_and_checkpoint(tmp_path):
    from ergm_tpu.data.synthetic import write_synthetic_dataset

    data_dir = str(tmp_path / "data")
    ckpt_dir = str(tmp_path / "ckpt")
    write_synthetic_dataset(data_dir, prefixes=("train",), num_dialogues=8,
                            turns_per_dialogue=4, base_vocab_size=128)

    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    # exactly the repo on PYTHONPATH: an inherited TPU-plugin site dir
    # (e.g. an axon sitecustomize) would override the worker's CPU pin
    env["PYTHONPATH"] = REPO
    # the worker sets its own JAX env before importing jax
    for k in ("JAX_PLATFORM_NAME", "JAX_PLATFORMS", "XLA_FLAGS"):
        env.pop(k, None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(pid), data_dir, ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for out in outs:
        step_lines = [l for l in out.splitlines() if l.startswith("STEP")]
        assert len(step_lines) >= 3, out
        assert "RESTORED OK" in out
        losses.append([l.split("LOSS")[1].strip() for l in step_lines])
    # both processes saw the same global batch and the same reduced grads
    assert losses[0] == losses[1], f"cross-host loss mismatch: {losses}"
