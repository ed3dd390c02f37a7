"""Flash attention backend for TPU (Pallas, memory-linear in sequence).

Wraps JAX's production Pallas TPU flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention: blockwise online
softmax, fp32 statistics, custom-VJP backward with separate dKV/dQ
kernels) as the backend that replaces the reference's eager attention
with its materialized L×L mask buffer (reference: src/model.py:68-74,
119-148).

Masking maps onto the kernel's segment-id mechanism instead of an
additive [B, H, Lq, Lk] bias tensor (which would reintroduce the O(L²)
HBM traffic flash exists to avoid): real tokens get segment id 1, pads
id 0 — pads can't attend across, and pad-row outputs are discarded by
construction.

Eligibility (`flash_attention_supported`):
- TPU backend,
- no attention-prob dropout (callers fall back to XLA when active),
- q/kv sequence lengths multiples of the 128 TPU lane tile
  (the data pipeline buckets to 128 — ergm_tpu/data/dataset.py),
- q length >= 128 (single-token decode steps use the XLA path; the
  cache-wide matmul there is tiny and XLA handles it well).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_MIN_BLOCK = 128


@functools.lru_cache()
def _kernel():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def flash_attention_supported(
    q, k, v, *, causal: bool, causal_offset=0,
    dropout_active: bool = False,
) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if dropout_active:
        return False
    lq, lk = q.shape[-2], k.shape[-2]
    if lq < _MIN_BLOCK or lq % _MIN_BLOCK or lk % _MIN_BLOCK:
        return False
    if causal and lq != lk:
        # the kernel's causal mask assumes q and kv indices share an origin;
        # offset prefills use masks via the XLA path
        try:
            int(causal_offset)
        except TypeError:
            return False
        if int(causal_offset) != 0 or lq > lk:
            return False
    return True


def flash_mha(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    *,
    causal: bool,
    scale: Optional[float] = None,
    q_mask: Optional[jnp.ndarray] = None,  # [B, Lq] 1=real
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lk] 1=real
) -> jnp.ndarray:
    fa = _kernel()
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    segment_ids = None
    if kv_mask is not None or q_mask is not None:
        B, _, lq, _ = q.shape
        lk = k.shape[-2]
        q_seg = (q_mask.astype(jnp.int32) if q_mask is not None
                 else jnp.ones((B, lq), jnp.int32))
        kv_seg = (kv_mask.astype(jnp.int32) if kv_mask is not None
                  else jnp.ones((B, lk), jnp.int32))
        segment_ids = fa.SegmentIds(q=q_seg, kv=kv_seg)

    # sm_scale must be static; traced scales (e.g. the per-layer
    # 1/(layer_idx+1) option) are folded into q instead by the caller.
    out = fa.flash_attention(
        q, k, v, ab=None, segment_ids=segment_ids,
        causal=causal, sm_scale=float(scale),
        block_sizes=_block_sizes(q.shape[-2], k.shape[-2]),
    )
    return out


def _pick_block(n: int) -> int:
    for b in (512, 256, 128):
        if n % b == 0:
            return b
    return min(n, _MIN_BLOCK)


@functools.lru_cache()
def _block_sizes(lq: int, lk: int):
    """512-sized blocks where the sequence allows: the backward kernels
    measure ~1.8x faster than the 128 defaults at GPT-2 training shapes
    (v5e, B=64 L=512); forward is unchanged. An asymmetric-backward
    sweep (results/attn_kernel_bench.jsonl) found dKV-q=256 2% faster
    in isolation (8.45 vs 8.64 ms/layer) but a wash-to-negative in the
    full train step (81.3k vs 82.4k tok/s), so blocks stay symmetric."""
    fa = _kernel()
    bq = _pick_block(lq)
    bk = _pick_block(lk)
    return fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
