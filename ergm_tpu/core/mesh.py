"""Device mesh and sharding helpers.

The reference is strictly single-device (src/main.py:40-43 picks one GPU
index; no torch.distributed anywhere — SURVEY.md §2.3). The rebuild is
SPMD from the start: a ``jax.sharding.Mesh`` with a ``data`` axis for
batch sharding and an optional ``model`` axis for tensor parallelism on
the larger GPT-2 sizes. XLA inserts the collectives (psum for gradient
reduction, all-gather for TP activations) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all local devices).

    A single ``-1`` entry absorbs the remaining device count, so the
    default ``shape=(-1,)`` is pure data parallelism over every chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if shape.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    if -1 in shape:
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        shape[shape.index(-1)] = len(devices) // known
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")
    # an explicit smaller shape uses a prefix of the devices
    dev_array = np.array(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def logical_to_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    # Drop axis names the mesh doesn't have (e.g. "model" on a pure-DP mesh).
    cleaned = []
    for entry in spec:
        if entry is None:
            cleaned.append(None)
        elif isinstance(entry, str):
            cleaned.append(entry if entry in mesh.axis_names else None)
        else:  # tuple of names
            kept = tuple(a for a in entry if a in mesh.axis_names)
            cleaned.append(kept if kept else None)
    return NamedSharding(mesh, P(*cleaned))


def param_partition_spec(path: Tuple[str, ...]) -> P:
    """Tensor-parallel PartitionSpec for a parameter, by its pytree path.

    Megatron-style sharding for transformer blocks:
    - attention qkv / mlp up-projection: shard the output features
      (column parallel) → ``P(None, "model")``
    - attention out-proj / mlp down-projection: shard the input features
      (row parallel) → ``P("model", None)``
    - embeddings: shard the vocab/feature dim where cheap; layernorms and
      biases of row-parallel layers stay replicated.

    Returns ``P()`` (replicated) for anything unrecognized — correctness
    never depends on a rule firing.

    Block params are stacked over the layer axis (leading L dim from the
    lax.scan layer stack), so their specs get a leading None.
    """
    name = "/".join(str(p) for p in path)
    stacked = name.startswith("blocks")

    def spec(*entries) -> P:
        return P(None, *entries) if stacked else P(*entries)

    # column-parallel kernels: shard output features. int8 serving
    # kernels (gpt2.quantize_params_int8: kernel_q [in, out] + per-out
    # kernel_scale [1, out]) shard the same way — their out dim.
    if name.endswith(("c_attn/kernel", "q_attn/kernel", "c_fc/kernel",
                      "c_attn/kernel_q", "q_attn/kernel_q", "c_fc/kernel_q",
                      "c_attn/kernel_scale", "q_attn/kernel_scale",
                      "c_fc/kernel_scale")):
        return spec(None, MODEL_AXIS)
    # row-parallel kernels: shard input features (XLA inserts the psum);
    # the per-out scale of a row-parallel int8 kernel stays replicated
    if name.endswith(("c_proj/kernel", "c_proj/kernel_q")):
        return spec(MODEL_AXIS, None)
    # column-parallel biases follow the sharded output dim
    if name.endswith(("c_attn/bias", "q_attn/bias", "c_fc/bias")):
        return spec(MODEL_AXIS)
    if name.endswith("wte/embedding") or name.endswith("lm_head/kernel"):
        return P(None, None)  # tied vocab table: replicate (vocab matmul is DP-bound here)
    return P()


def zero1_sharding_tree(opt_state, mesh: Mesh):
    """ZeRO-1 shardings for an optimizer-state pytree: shard each array
    over the DATA axis along its largest divisible dimension.

    Data parallelism replicates params AND optimizer state per chip, so
    AdamW's fp32 master moments dominate HBM long before the model does
    (gpt2-xl: ~15.5 GB of Adam state vs a 15.75 GB v5e chip). The
    optimizer update is elementwise, so the moments never need to be
    co-resident: shard them over ``data`` and XLA slices the (replicated,
    psum-reduced) gradients into each chip's shard for the update — the
    classic ZeRO stage-1 layout, expressed purely as shardings.

    Per-leaf rule: keep any existing sharded dims (TP'd moments inherit
    the param's ``model``-axis spec through ``optax``'s ``zeros_like``),
    then place ``data`` on the largest still-replicated dim divisible by
    the data-axis size; scalars and indivisible leaves replicate."""
    dp = int(mesh.shape.get(DATA_AXIS, 1))

    def leaf(x):
        if dp <= 1 or not hasattr(x, "ndim") or x.ndim == 0:
            return replicated(mesh)
        cur = []
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            cur = list(x.sharding.spec)
        cur += [None] * (x.ndim - len(cur))

        def uses_data(entry):
            return (entry == DATA_AXIS
                    or (isinstance(entry, tuple) and DATA_AXIS in entry))

        if any(uses_data(e) for e in cur):  # idempotent: already ZeRO-1
            return NamedSharding(mesh, P(*cur))
        best = None
        for i, d in enumerate(x.shape):
            if cur[i] is None and d % dp == 0 and d >= dp and (
                    best is None or d > x.shape[best]):
                best = i
        if best is not None:
            cur[best] = DATA_AXIS
        return NamedSharding(mesh, P(*cur))

    return jax.tree_util.tree_map(leaf, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optimizer-state pytree with ZeRO-1 shardings (see
    ``zero1_sharding_tree``)."""
    shardings = zero1_sharding_tree(opt_state, mesh)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def shard_params(params, mesh: Mesh):
    """Apply `param_partition_spec` across a param pytree, via device_put."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", getattr(k, "name", str(k)))) for k in path
        )
        sharding = logical_to_sharding(mesh, param_partition_spec(keys))
        out.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, out)
