"""Batched-rows prefill attention kernel (Pallas, short-sequence regime).

The headline B=256 / L=128 prefill runs its attention on XLA (round-4
gate: the Pallas block kernel's (batch, head) grid is 3072 programs of
~4 MFLOP each — per-program overhead ate the win). The round-5 device
trace shows what that XLA choice costs: QK 5.0 ms + softmax over the
materialized f32 [256,12,128,128] probs 10.6 ms + PV 4.2 ms = ~20 ms of
an 86 ms prefill, 10-75x above their bounds (transposed batched-GEMM
layouts + 402 MB of f32 probs traffic per layer), while the trunk GEMMs
already run at ~90% MFU. The attention FLOPs themselves are 65 us.

This kernel reshapes the problem for the grid, not the math:

- MERGED-layout operands [B, L, H*Dh]: lane-perfect (768 = 6 tiles), no
  [B, H, L, 64] half-tile padding, and no head split/merge transposes —
  the caller's `_split_heads`/`_merge_heads` pair cancels out.
- grid = (batch-tile, head-PAIR): each 128-lane block holds TWO Dh=64
  heads. Per-head scores come from TWO lane-masked NT matmuls per
  operand tile (mask one head's lanes, contract all 128) — MXU-shaped
  [L, 128] x [L, 128]^T, no strided 64-lane slicing.
- batched `dot_general` over the Bt rows of a tile: one program owns
  Bt full attention problems, so per-program overhead is amortized
  ~Bt x vs the block kernel's one-problem programs.
- f32 scores live only in VMEM ([Bt, L, L] f32 = 2 MB at Bt=32); the
  HBM probs round-trip disappears.

Math mirrors ops/attention.py::xla_attention exactly (f32 QK with
where-style causal mask, additive kv bias, f32 softmax, bf16 PV), so
outputs match the gated XLA path to bf16 rounding.

Gate: causal prefix prefill, head_dim == 64 (the GPT-2 family), D % 128
== 0, L <= 512, no dropout. Measured on v5e before flipping the gpt2
routing (results/prefill_kernel_bench.jsonl).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches ops/attention.py

_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float, dh: int,
            has_mask: bool, causal: bool):
    f32 = jnp.float32
    Bt, L, W = q_ref.shape                      # W = 128 = 2 heads x dh
    Lk = k_ref.shape[1]
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
    half0 = (lane < dh)

    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (L, Lk), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (L, Lk), 1)
        cmask = (kpos <= qpos)[None]            # [1, L, Lk]
    if has_mask:
        kvb = (1.0 - m_ref[:].astype(f32))[:, None, :] * _NEG_INF  # [Bt,1,Lk]

    nt = (((2,), (2,)), ((0,), (0,)))           # contract lanes, batch Bt
    pv = (((2,), (1,)), ((0,), (0,)))

    def head_half(sel, selk):
        qm = jnp.where(sel, q, jnp.zeros_like(q))
        s = lax.dot_general(qm, k, nt, preferred_element_type=f32)
        s = s * scale                            # [Bt, L, Lk]
        if causal:
            s = jnp.where(cmask, s, _NEG_INF)
        if has_mask:
            s = s + kvb
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        vm = jnp.where(selk, v, jnp.zeros_like(v))
        return lax.dot_general(p, vm, pv, preferred_element_type=f32)

    lane_k = jax.lax.broadcasted_iota(jnp.int32, (Lk, W), 1)
    half0k = (lane_k < dh)
    out = (head_half(half0, half0k)
           + head_half(jnp.logical_not(half0), jnp.logical_not(half0k)))
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_bt(B: int, L: int, Lk: int = 0) -> int:
    Lk = Lk or L
    for bt in (32, 16, 8):
        if B % bt:
            continue
        ops = 2 * bt * (2 * L + 2 * Lk) * 128   # q,out + k,v tiles (bf16)
        tmp = 2 * bt * L * Lk * 4 + 4 * bt * Lk * 128 * 2  # scores + masked
        if 2 * ops + tmp <= 10 * 1024 * 1024:   # ops double-buffered
            return bt
    return 0


@functools.partial(jax.jit,
                   static_argnames=("scale", "n_head", "bt", "causal"))
def _call(qm, km, vm, mask, *, scale, n_head, bt, causal=True):
    B, L, D = qm.shape
    Lk = km.shape[1]
    dh = D // n_head
    kern = functools.partial(_kernel, scale=scale, dh=dh,
                             has_mask=mask is not None, causal=causal)
    tile = pl.BlockSpec((bt, L, 128), lambda b, h: (b, 0, h),
                        memory_space=pltpu.VMEM)
    ktile = pl.BlockSpec((bt, Lk, 128), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM)
    in_specs = [tile, ktile, ktile]
    args = [qm, km, vm]
    if mask is not None:
        in_specs.append(pl.BlockSpec((bt, Lk), lambda b, h: (b, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)

    def body(*refs):
        if mask is not None:
            q_ref, k_ref, v_ref, m_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
            m_ref = None
        kern(q_ref, k_ref, v_ref, m_ref, o_ref)

    flops = 4 * B * L * Lk * 128 * 2
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B, L, D), qm.dtype),
        grid=(B // bt, D // 128),
        in_specs=in_specs,
        out_specs=tile,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * B * (L + Lk) * D,
            transcendentals=B * L * Lk * n_head),
        interpret=_interpret(),
    )(*args)


def supported(B: int, L: int, config, deterministic: bool) -> bool:
    """Shape/config gate — see module docstring."""
    import os
    if os.environ.get("ERGM_PREFILL_KERNEL", "1") in ("0", "false"):
        return False  # A/B escape hatch
    c = config
    if c.head_dim != 64 or (c.n_head * c.head_dim) % 128:
        return False
    if not deterministic and c.attn_pdrop > 0:
        return False
    if L > 512 or L % 8:
        return False
    return _pick_bt(B, L) > 0


def prefill_mha(qm, km, vm, kv_mask, *, n_head, scale, causal=True):
    """(Rectangular) attention over merged-layout q [B, L, D] and
    k/v [B, Lk, D].

    ``kv_mask``: [B, Lk] 1=real key, or None. ``scale`` may be traced
    (folded into q) or a static float. ``causal=False`` is the cross
    prefill form (Lk = caption length). Returns [B, L, D] merged."""
    if not isinstance(scale, (int, float)):
        qm = qm * scale.astype(qm.dtype)
        scale = 1.0
    B, L, _ = qm.shape
    return _call(qm, km, vm,
                 None if kv_mask is None else kv_mask.astype(jnp.float32),
                 scale=float(scale), n_head=n_head,
                 bt=_pick_bt(B, L, km.shape[1]), causal=causal)
