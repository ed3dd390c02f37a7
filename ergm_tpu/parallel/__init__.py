"""Parallelism layer: device meshes, sharding rules, SPMD placement.

The concrete helpers live in ergm_tpu.core.mesh (they are needed by the
core config/training path without import cycles); this package is the
public surface:

- ``make_mesh``: build a Mesh over local devices ((-1,) = pure DP)
- ``batch_sharding`` / ``replicated``: NamedShardings for step inputs
- ``param_partition_spec`` / ``shard_params``: Megatron-style tensor
  parallelism for the stacked transformer layer format
  (column-parallel qkv/up-proj, row-parallel out/down-proj)

The reference is strictly single-device (src/main.py:40-43; SURVEY.md
§2.3) — data parallelism over the mesh ``data`` axis is the capability-
parity configuration, the ``model`` axis extends it for larger GPT-2
variants.
"""

from ergm_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,  # noqa: F401
                                logical_to_sharding, make_mesh,
                                param_partition_spec, replicated, shard_params)
