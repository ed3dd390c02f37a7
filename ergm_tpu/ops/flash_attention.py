"""Pallas flash attention for TPU.

Blockwise online-softmax attention (no materialized L×L score matrix),
replacing the reference's eager masked attention with its per-layer
[1, 1, 1024, 1024] bias buffer (reference: src/model.py:68-74, 119-148).

This module is filled in by the kernel milestone; until then
``flash_attention_supported`` reports False and callers fall back to the
XLA path in ergm_tpu/ops/attention.py, which is numerically identical.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def flash_attention_supported(q, k, v, *, causal: bool, causal_offset: int = 0) -> bool:
    return False


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal_offset: int = 0,
) -> jnp.ndarray:
    raise NotImplementedError("pallas flash attention lands in the kernel milestone")
