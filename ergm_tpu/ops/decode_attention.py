"""Pallas TPU kernel: single-token decode attention over a KV cache.

The decode hot loop attends one query token per row against the cache
buffer. The XLA path reads the full [B, H, T, D] cache every step even
though only ``cur`` positions are live; for long caches (the reference's
max_len=1024, SURVEY.md §5 long-context row) most of that read is
wasted. This kernel:

- tiles the cache into key blocks and SKIPS blocks at/after the live
  length entirely (scalar-prefetched ``cur``, the paged-attention
  pattern from jax.experimental.pallas.ops.tpu.paged_attention):
  dead blocks CLAMP their BlockSpec index map to the previous live
  block, so the pipeline issues no new DMA for them (Pallas skips
  re-fetching a block whose index equals the last one) — guarding only
  the compute with ``pl.when`` would still stream the whole dead cache
  through VMEM, which is exactly the traffic this kernel exists to
  avoid (round-1 version's defect: it lost 2-5x to XLA because of it),
- runs the online-softmax reduction across blocks in fp32 VMEM scratch,
- folds the [B, T] validity mask (left-pads + unwritten tail) into the
  score mask — single-token decode needs no separate causal term,
- marks the batch grid dimension parallel for megacore.

Shapes: q [B, H, D] (one token per row), k/v [B, H, T, D], mask [B, T].
Used by the cached self-attention when Lq == 1 on TPU; XLA remains the
fallback (CPU, multi-token prefill, tiny caches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(cur_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
            m_ref, l_ref, acc_ref, *, block_k: int, scale: float):
    i = pl.program_id(1)
    num_blocks = pl.num_programs(1)
    cur = cur_ref[0]

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i * block_k < cur)
    def _compute():
        q = q_ref[0].astype(jnp.float32)          # [H, D]
        k = k_ref[0].astype(jnp.float32)          # [H, BK, D]
        # VPU elementwise-reduce (per-head batched dots aren't lowerable to
        # the MXU here, and the kernel is bandwidth-bound anyway)
        s = jnp.sum(q[:, None, :] * k, axis=-1) * scale  # [H, BK]
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        valid = (kpos < cur) & (mask_ref[0, 0][None, :] > 0)
        s = jnp.where(valid, s, _NEG)

        m_prev = m_ref[:, :1]                      # [H, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [H, 1]
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        # re-mask: a fully-masked block would otherwise yield
        # exp(mask_value - mask_value) = 1 for every position
        p = jnp.where(valid, jnp.exp(s - m_next), 0.0)  # [H, BK]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0].astype(jnp.float32)           # [H, BK, D]
        pv = jnp.sum(p[:, :, None] * v, axis=1)    # [H, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[:, :1] = m_next
        l_ref[:, :1] = l_next

    @pl.when(i == num_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / safe_l).astype(o_ref.dtype)


def decode_attention(
    q: jnp.ndarray,      # [B, H, D]
    k: jnp.ndarray,      # [B, H, T, D]
    v: jnp.ndarray,      # [B, H, T, D]
    cur: jnp.ndarray,    # [] int32 live length (keys < cur are attendable)
    mask: jnp.ndarray,   # [B, T] float/bool, 1 = attendable
    *,
    scale: float,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, D] attention outputs."""
    B, H, T, D = k.shape
    block_k = min(block_k, T)
    if T % block_k:
        raise ValueError(f"cache length {T} not divisible by block_k {block_k}")
    grid = (B, T // block_k)

    cur_arr = jnp.asarray(cur, jnp.int32).reshape(1)
    # [B, 1, T]: TPU block shapes need the last two dims tile-aligned or
    # full-size; the singleton middle dim satisfies that for row blocks.
    mask_i = jnp.broadcast_to(mask.astype(jnp.int32), (q.shape[0],) + mask.shape[1:]
                              ).reshape(q.shape[0], 1, -1)

    kernel = functools.partial(_kernel, block_k=block_k, scale=float(scale))

    def kv_map(b, i, cur_ref):
        # dead blocks (start >= cur) re-point at the LAST LIVE block: the
        # pipeline sees an unchanged index and skips their DMA entirely
        last_live = jnp.maximum(jax.lax.div(cur_ref[0] - 1, block_k), 0)
        return (b, 0, jnp.minimum(i, last_live), 0)

    def mask_map(b, i, cur_ref):
        last_live = jnp.maximum(jax.lax.div(cur_ref[0] - 1, block_k), 0)
        return (b, 0, jnp.minimum(i, last_live))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, i, cur_ref: (b, 0, 0)),
                pl.BlockSpec((1, H, block_k, D), kv_map),
                pl.BlockSpec((1, H, block_k, D), kv_map),
                pl.BlockSpec((1, 1, block_k), mask_map),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, i, cur_ref: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),  # m (lane-padded)
                pltpu.VMEM((H, 128), jnp.float32),  # l
                pltpu.VMEM((H, D), jnp.float32),    # acc
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(cur_arr, q, k, v, mask_i)


def decode_attention_reference(q, k, v, cur, mask, *, scale):
    """XLA oracle for tests: same math, full reads. Rows with no valid key
    output zeros, matching the kernel's l==0 guard (softmax over an empty
    set is undefined; zeros are the stable convention)."""
    logits = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32),
                        k.astype(jnp.float32), precision="highest") * scale
    kpos = jnp.arange(k.shape[2])[None, None, :]
    valid = (kpos < cur) & (mask[:, None, :] > 0)
    logits = jnp.where(valid, logits, _NEG)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs, v.astype(jnp.float32),
                     precision="highest")
    any_valid = jnp.any(valid, axis=-1)  # [B, 1]
    return jnp.where(any_valid[..., None], out, 0.0).astype(q.dtype)
