"""Deterministic RNG threading.

Replaces the reference's global seed mutation (src/main.py:284-289 seeds
numpy/torch/cuda/random) with explicit JAX key threading: one root key
per run, split functionally per step/purpose. Under jit this is traced
once; there is no global state to desynchronize across SPMD replicas.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(key: jax.Array, step) -> jax.Array:
    """Per-step key, usable inside jit (step may be traced)."""
    return jax.random.fold_in(key, step)
