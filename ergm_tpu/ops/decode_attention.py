"""Batched-rows int8-KV decode self-attention kernel (Pallas).

The round-5 device trace puts the B=256 decode step's self-attention at
~109 us/layer (QK 65 + PV 44 at T=160) against a ~64 us int8-cache read
bound: XLA lowers the cache slice multiply-reduce to VPU loop fusions
at roughly a quarter of HBM peak (the round-3 finding), and no XLA-side
reformulation measured better. The round-1 bespoke kernel lost to
per-(batch, head)-program overhead and the [H, block_k] MXU shape; this
kernel applies the round-5 lessons from the PREFILL kernel that won
(batched rows per program, lane-legal operand views, zero in-kernel
reshapes):

- the cache keeps its canonical [L, B, H, T, Dh=64] int8 layout; the
  kernel consumes a FREE contiguous view [L, B, H, T/2, 128] (a
  bitcast reshape outside the kernel: each 128-lane row holds two
  consecutive tokens' 64 values), which satisfies the (32, 128) int8
  tile with NO relayout and NO half-tile padding.
- grid = (batch-tile, head-PAIR); per head the score math lives in
  TWIN even/odd [bt, T/2] tensors: token-2j scores from a [128]-vector
  contraction over the pair row's low half, token-2j+1 from the high
  half — every shape keeps a 128-multiple minor, so nothing is ever
  reshaped in-kernel.
- per-(token, head) int8 scales arrive as [B, H, T] f32 (the stored
  [.., T, 1] buffer squeezed outside — free) and are split even/odd by
  constant [T, T/2] selection matmuls on the MXU.
- the joint softmax normalizes across both twins (max/sum over the
  concatenated logical axis without concatenating), matching
  gpt2._self_attention_cached's scale-factored int8 math: s = (q . kq)
  * scale * k_scale, additive -1e9 tail mask, f32 softmax, p * v_scale,
  then PV against the raw int8 values.

MEASURED (v5e, device trace, scripts/decode_kernel_trace.py round 5):
a DECLINE, decisively — 34.5 ms vs XLA's 2.31 ms per 12 layers at the
B=256/T=256 headline shape (0.067x). Two independent causes:
(1) the kernel body runs ~1.77 ms/layer: the twin-tensor VPU
multiply-reduce chains over [bt, T/2, 128] f32 lower far below the
~550 GB/s the cross kernel reached at Lc=32 — the T/2=128 sublane
reductions and per-head broadcast chains dominate; (2) STRUCTURAL: XLA
lays the int8 cache out B-minor ({1,4,2,3,0}), so feeding it to any
pallas_call forces a full-cache relayout copy (2.8 ms per buffer in
the trace) — a barrier for EVERY Pallas decode kernel over the
XLA-managed cache, not just this one. Together with the cross-sublayer
decline (-6.5% in situ) this closes the round-4 "whole-layer fused
decode kernel" question: on this runtime the XLA decode step's
attention fusions are within ~2x of the cache read bound and
unbeatable from Pallas across the relayout toll. The module stays as
the measured experiment (default-off gate; parity tests keep it
honest).

Gate: single-token scalar-cursor decode (the generate path), int8 KV,
head_dim 64, T % 256 == 0. Parity: tests/test_decode_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def _kernel(idx_ref, scale_ref, q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
            o_ref, *, dh: int):
    # ks_ref/vs_ref: [bt, 2*T] — the head pair's scales flattened on
    # lanes (head h of the pair at lanes [h*T, (h+1)*T), 128-aligned)
    f32 = jnp.float32
    Bt, W = q_ref.shape                       # W = 128 = two dh=64 heads
    Th = kp_ref.shape[2]                      # T/2 pair rows
    T = 2 * Th
    idx = idx_ref[0]
    scale = scale_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    low = (lane < dh).astype(f32)             # [1, 128]
    high = 1.0 - low
    # selection matrices: ks [bt, T] -> even/odd [bt, T/2]
    trow = jax.lax.broadcasted_iota(jnp.int32, (T, Th), 0)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (T, Th), 1)
    sel_e = (trow == 2 * tcol).astype(f32)
    sel_o = (trow == 2 * tcol + 1).astype(f32)
    # tail masks in even/odd space: token t visible iff t <= idx
    jpos = jax.lax.broadcasted_iota(jnp.int32, (1, Th), 1)
    me = jnp.where(2 * jpos <= idx, 0.0, _NEG_INF)       # [1, T/2]
    mo = jnp.where(2 * jpos + 1 <= idx, 0.0, _NEG_INF)

    outs = []
    for h in (0, 1):
        sel = low if h == 0 else high
        # tile this head's 64 q lanes into both halves of the pair row
        qh = q_ref[:].astype(f32) * sel                   # [bt, 128]
        ql = qh + pltpu.roll(qh, dh, 1)  # +-64 coincide at W=128
        kp = kp_ref[:, h].astype(f32)                     # [bt, T/2, 128]
        prod = kp * ql[:, None, :]
        s_e = lax.dot_general(prod, low[0], (((2,), (0,)), ((), ())),
                              preferred_element_type=f32)  # [bt, T/2]
        s_o = lax.dot_general(prod, high[0], (((2,), (0,)), ((), ())),
                              preferred_element_type=f32)
        ks = ks_ref[:, h * T:(h + 1) * T]                  # [bt, T]
        ks_e = jnp.dot(ks, sel_e, preferred_element_type=f32)
        ks_o = jnp.dot(ks, sel_o, preferred_element_type=f32)
        s_e = s_e * scale * ks_e + me
        s_o = s_o * scale * ks_o + mo
        # joint softmax across both twins
        m = jnp.maximum(jnp.max(s_e, axis=1, keepdims=True),
                        jnp.max(s_o, axis=1, keepdims=True))
        e_e = jnp.exp(s_e - m)
        e_o = jnp.exp(s_o - m)
        z = (jnp.sum(e_e, axis=1, keepdims=True)
             + jnp.sum(e_o, axis=1, keepdims=True))
        p_e = e_e / z
        p_o = e_o / z
        vs = vs_ref[:, h * T:(h + 1) * T]
        p_e = p_e * jnp.dot(vs, sel_e, preferred_element_type=f32)
        p_o = p_o * jnp.dot(vs, sel_o, preferred_element_type=f32)
        # broadcast twin probs onto the pair-lane layout and reduce
        w = (p_e[:, :, None] * low[None] + p_o[:, :, None] * high[None])
        vp = vp_ref[:, h].astype(f32)
        acc = jnp.sum(vp * w, axis=1)                      # [bt, 128]
        # fold the two token-parity halves: out[d] = acc[d] + acc[64+d],
        # placed into this head's half of the output block
        fold = acc + pltpu.roll(acc, dh, 1)
        outs.append(fold * sel)
    o_ref[:] = (outs[0] + outs[1]).astype(o_ref.dtype)


def _pick_bt(B: int, T: int) -> int:
    for bt in (64, 32, 16, 8):
        if B % bt:
            continue
        tiles = 2 * 2 * bt * 2 * (T // 2) * 128   # kp+vp, double-buffered
        temps = 3 * bt * (T // 2) * 128 * 4       # prod/w/acc f32
        if tiles + temps <= 10 * 1024 * 1024:
            return bt
    return 0


@functools.partial(jax.jit, static_argnames=("n_head", "bt"))
def _call(idx, scale, qm, kp, vp, ks, vs, *, n_head, bt):
    B, D = qm.shape
    H = n_head
    Th = kp.shape[2]
    kern = functools.partial(_kernel, dh=64)
    grid = (B // bt, H // 2)
    qspec = pl.BlockSpec((bt, 128), lambda b, h: (b, h),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((bt, 2, Th, 128), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    # scales flattened [B, H*T]: block h = the head pair's 2T lanes
    sspec = pl.BlockSpec((bt, 4 * Th), lambda b, h: (b, h),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, D), qm.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda b, h: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda b, h: (0,), memory_space=pltpu.SMEM),
            qspec, cspec, cspec, sspec, sspec,
        ],
        out_specs=qspec,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * Th * 128, bytes_accessed=4 * B * H * Th * 128,
            transcendentals=B * H * 2 * Th),
        interpret=_interpret(),
    )(idx, scale, qm, kp, vp, ks, vs)


def supported(B: int, T: int, config) -> bool:
    import os
    # default OFF: measured 0.067x XLA at the headline shape (see
    # module docstring); opt in with ERGM_DECODE_KERNEL=1 for A/B only
    if os.environ.get("ERGM_DECODE_KERNEL", "0") in ("0", "false"):
        return False
    c = config
    if c.head_dim != 64 or c.n_head % 2:
        return False
    if T % 256:
        return False
    return _pick_bt(B, T) > 0


def decode_mha_int8(q, kq, vq, ks, vs, index, scale, *, n_head):
    """Scale-factored int8 decode attention, merged output.

    q: [B, H, 1, 64]; kq/vq: [B, H, T, 64] int8 (the layer's cache
    slice); ks/vs: [B, H, T, 1] f32 scales; index: scalar int32 (tokens
    0..index visible); scale: static or traced attention scale.
    Returns [B, H*64] merged attention output (pre-projection)."""
    B, H, T, dh = kq.shape
    qm = q[:, :, 0, :].reshape(B, H * dh)
    if not isinstance(scale, (int, float)):
        sc = jnp.asarray(scale, jnp.float32).reshape(1)
    else:
        sc = jnp.full((1,), scale, jnp.float32)
    kp = kq.reshape(B, H, T // 2, 128)
    vp = vq.reshape(B, H, T // 2, 128)
    out = _call(jnp.asarray(index, jnp.int32).reshape(1), sc,
                qm, kp, vp,
                ks[..., 0].reshape(B, H * T), vs[..., 0].reshape(B, H * T),
                n_head=n_head, bt=_pick_bt(B, T))
    return out
