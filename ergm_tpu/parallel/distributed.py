"""Multi-host (multi-process) SPMD setup.

The reference is single-process/single-GPU (SURVEY.md §2.3). Scaling
across hosts here follows JAX's standard recipe: every host runs the
same program, ``jax.distributed.initialize`` wires the processes over
DCN, and after that ``jax.devices()`` is the GLOBAL device list — a
``Mesh`` built over it spans the pod, XLA routes collectives over ICI
within a slice and DCN across slices. The data pipeline shards per host
(ergm_tpu.data.grain_loader host_index/host_count).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX; a no-op for single-process runs.

    With no arguments, cluster autodetection applies (TPU pod metadata /
    standard env vars). Returns a summary dict for logging.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def initialize_from_env(environ=None) -> Optional[dict]:
    """Bootstrap multi-host from launcher environment variables.

    The CLI calls this before building any mesh, so `train.sh` works
    unchanged under a multi-host launcher that exports:

      ERGM_COORDINATOR    host:port of process 0
      ERGM_NUM_PROCESSES  total process count
      ERGM_PROCESS_ID     this process's rank

    All three must be set together (partial configuration is an error —
    silently training single-host on a misconfigured pod duplicates
    data). Returns the summary dict when initialized, None when the env
    carries no multi-host configuration (single-process runs and
    TPU-pod autodetection, where jax initializes lazily, are no-ops
    here).
    """
    import os

    env = os.environ if environ is None else environ
    keys = ("ERGM_COORDINATOR", "ERGM_NUM_PROCESSES", "ERGM_PROCESS_ID")
    present = [k for k in keys if env.get(k)]
    if not present:
        return None
    if len(present) < len(keys):
        missing = sorted(set(keys) - set(present))
        raise ValueError(
            f"Partial multi-host environment: {present} set but {missing} "
            f"missing; export all of {keys} (or none).")
    return initialize(
        coordinator_address=env["ERGM_COORDINATOR"],
        num_processes=int(env["ERGM_NUM_PROCESSES"]),
        process_id=int(env["ERGM_PROCESS_ID"]),
    )


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
