"""Attention ops with pluggable backends.

The reference computes attention eagerly with a materialized L×L causal
mask buffer per layer (reference: src/model.py:68-74, 119-148). Here the
math is identical but expressed once, with two backends:

- ``xla``: plain einsum attention with additive-bias masking. XLA fuses
  the softmax chain; this is also the CPU/test path and the
  single-token decode path.
- ``pallas``: blockwise flash attention (ergm_tpu/ops/flash_attention.py)
  that never materializes the L×L matrix — memory-linear in sequence
  length, targeting the TPU MXU. Padding masks ride as segment ids.

Semantics preserved from the reference:
- 1/sqrt(head_dim) scaling gated by ``scale_attn_weights``
  (src/model.py:122-125),
- optional 1/(layer_idx+1) scaling (src/model.py:127-128) — folded into
  q on the flash path since kernel scales must be static,
- causal masking with large-negative fill (src/model.py:130-135),
- 0/1 key masks for padding / encoder masks (src/model.py:137-138,
  478-491),
- softmax in fp32 regardless of compute dtype (the reference's
  ``reorder_and_upcast_attn`` made this optional; here it is always on).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # large-negative fill; fp32 softmax makes this safe in bf16 nets


def attention_bias_from_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, Lk] 0/1 mask -> additive [B, 1, 1, Lk] bias (HF convention,
    reference: src/model.py:478-482)."""
    bias = (1.0 - mask.astype(dtype)) * _NEG_INF
    return bias[:, None, None, :]


def xla_attention(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    *,
    causal: bool,
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B, H, Lq, Lk]
    scale: Optional[float] = None,
    causal_offset: int = 0,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Reference attention math on the XLA path.

    ``causal_offset`` supports KV-cached decode: query position i attends
    to key positions <= i + causal_offset (the reference equivalent is
    slicing the bias buffer at key_length - query_length,
    src/model.py:131-132).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    # fp32 logits for a stable softmax (cf. _upcast_and_reordered_attn,
    # src/model.py:150-188 — always on here).
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32, precision="highest")
    logits = logits * scale
    if causal:
        lq, lk = q.shape[-2], k.shape[-2]
        qpos = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0) + causal_offset
        kpos = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        logits = jnp.where(kpos <= qpos, logits, _NEG_INF)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    # attention-probability dropout (reference: src/model.py:101, 142)
    if not deterministic and dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     precision="highest")
    return out


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lk] 1=real key
    q_mask: Optional[jnp.ndarray] = None,   # [B, Lq] 1=real query (flash seg ids)
    extra_bias: Optional[jnp.ndarray] = None,  # additive, XLA path only
    scale: Optional[float] = None,
    causal_offset: int = 0,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Dispatch to a Pallas kernel on TPU, XLA math elsewhere.

    ``impl``:
    - ``auto``: ``pallas`` on TPU, ``xla`` elsewhere.
    - ``pallas``: best available Pallas backend — the fused block kernel
      (ergm_tpu/ops/block_attention.py, whole-sequence problems in VMEM,
      single-pass backward, in-kernel dropout) when the shape fits, else
      the library flash kernel (no dropout), else XLA.
    - ``block`` / ``flash``: pin a specific Pallas backend (bench/tests).
    - ``xla``: reference einsum math.

    The ``ERGM_ATTN_IMPL`` env var overrides ``impl`` for A/B runs.
    Masking rides as segment masks on the Pallas paths and as an
    additive bias on the XLA path (numerically identical). With an
    ``extra_bias`` given, only the XLA path applies. Attention-prob
    dropout runs in-kernel on the block path; on the flash path it
    forces the XLA fallback (materialized [B, H, L, L] — measured to
    OOM the B=48 train step, results/train_ablation.jsonl).
    """
    import os

    impl = os.environ.get("ERGM_ATTN_IMPL", impl)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    dropout_active = (not deterministic) and dropout_rate > 0.0 and rng is not None
    if impl in ("pallas", "block", "flash") and extra_bias is None:
        from ergm_tpu.ops.block_attention import (
            block_attention_supported, block_mha)
        from ergm_tpu.ops.flash_attention import (
            flash_attention_supported, flash_mha)

        static_scale = scale
        if scale is not None and not isinstance(scale, (int, float)):
            # traced scale (per-layer scaling under scan): fold into q
            static_scale = None

        if (impl in ("pallas", "block")
                and block_attention_supported(q, k, v, causal=causal,
                                              causal_offset=causal_offset)):
            if static_scale is None and scale is not None:
                q = q * scale
                static_scale = 1.0
            seed = None
            if dropout_active:
                seed = jax.random.bits(rng, dtype=jnp.uint32).astype(jnp.int32)
            return block_mha(
                q, k, v, causal=causal, scale=static_scale,
                q_mask=q_mask, kv_mask=kv_mask,
                dropout_rate=dropout_rate if dropout_active else 0.0,
                dropout_seed=seed)
        if (impl in ("pallas", "flash")
                and flash_attention_supported(q, k, v, causal=causal,
                                              causal_offset=causal_offset,
                                              dropout_active=dropout_active)):
            if static_scale is None and scale is not None:
                q = q * scale
                static_scale = 1.0
            return flash_mha(q, k, v, causal=causal, scale=static_scale,
                             q_mask=q_mask, kv_mask=kv_mask)
    bias = attention_bias_from_mask(kv_mask) if kv_mask is not None else None
    if extra_bias is not None:
        bias = extra_bias if bias is None else bias + extra_bias
    return xla_attention(
        q, k, v, causal=causal, bias=bias, scale=scale, causal_offset=causal_offset,
        dropout_rate=dropout_rate, deterministic=deterministic, rng=rng,
    )
