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


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
