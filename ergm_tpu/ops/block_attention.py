"""Fused block attention kernel (Pallas TPU) for ERGM training shapes.

Motivation (measured, see results/attn_kernel_bench.jsonl and
results/train_ablation.jsonl): at the GPT-2 training shape
[B=48, H=12, L=512, D=64] the library flash kernel costs ~9.6 ms
fwd+bwd per layer — ~110 ms of a 310 ms train step — and its backward
runs TWO passes (dKV and dQ), each re-computing the score matrix and
re-reading Q/K/V from HBM. At L <= 1024 the entire per-head problem
fits in VMEM, so this kernel specializes:

- grid = (batch, head): one program owns a whole [L, L] attention
  problem; no online-softmax bookkeeping, one fp32 softmax in VMEM.
- single-pass backward: ONE score recompute produces dQ, dK and dV
  together (5 matmuls vs the library's 7, 1 exp vs 2). The softmax
  statistics are recomputed in-kernel, so no LSE residual is ever
  written to or read from HBM.
- causal q-sub-blocking: the q rows are processed in static sub-blocks,
  each only contracting the keys it can see — recovers part of the 2x
  causal FLOP saving without more grid points.
- in-kernel dropout (``pltpu.prng_random_bits``) reproduces the
  reference's attention-probability dropout (reference:
  src/model.py:101, 142) AT FLASH SPEED — the XLA fallback with its
  materialized [B, H, L, L] tensor (which OOMs the B=48 train step
  outright, results/train_ablation.jsonl) is no longer the price of
  ``attn_pdrop > 0``. The keep mask is regenerated bit-identically in
  the backward from the same per-(batch, head) seed.

Masking semantics match ergm_tpu/ops/attention.py: causal via position
comparison, padding via 0/1 key masks. Fully-masked query rows (query
padding) produce zero output and zero gradients — same convention as
the flash segment-id path; their outputs are discarded by construction
in the model.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9  # matches ops/attention.py; fp32 softmax makes this safe

# dropout keep-probability threshold in uint32 space: keep <=> bits >= thr
_U32 = 4294967296.0


def _causal_mask(lq: int, lk: int, q0: int) -> jnp.ndarray:
    qpos = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0) + q0
    kpos = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    return kpos <= qpos


def _keep_mask(seed_ref, dropout_rate: float, n_heads: int, lq: int, lk: int,
               interpret: bool):
    b, h = pl.program_id(0), pl.program_id(1)
    thr = jnp.uint32(min(dropout_rate * _U32, _U32 - 1))
    if interpret:
        # pltpu.prng_* has no interpreter implementation; CPU tests use a
        # counter-based hash (same stream in fwd and bwd, which is the
        # contract — the TPU stream is the hardware PRNG)
        mix = (seed_ref[0, 0] + b * n_heads + h).astype(jnp.uint32)
        r = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (lq, lk), 1)
        x = r * jnp.uint32(lk) + c + mix * jnp.uint32(2654435761)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x >= thr
    pltpu.prng_seed(seed_ref[0, 0] + b * n_heads + h)
    bits = pltpu.bitcast(pltpu.prng_random_bits((lq, lk)), jnp.uint32)
    return bits >= thr


def _probs(q, k, km_row, qm_col, *, scale, causal, q0, kext):
    """Masked, normalized attention probabilities for one q sub-block.

    Shared verbatim between forward and backward so the backward's
    recomputed statistics are bit-identical to the forward's.
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [lsub, kext]
    mask = km_row.astype(jnp.bool_)                          # [1, kext]
    if causal:
        mask = jnp.logical_and(mask, _causal_mask(q.shape[0], kext, q0))
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pn = p / jnp.maximum(l, 1e-30)
    # zero fully-padded query rows (flash segment-id convention)
    return jnp.where(qm_col.astype(jnp.bool_), pn, 0.0)


def _fwd_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, seed_ref, o_ref,
                *, scale: float, causal: bool, subs: int,
                dropout_rate: float, n_heads: int, interpret: bool):
    """One (batch, head) attention problem, entirely in VMEM."""
    k = k_ref[0, 0]            # [Lk, D]
    v = v_ref[0, 0]            # [Lk, D]
    lq = q_ref.shape[2]
    lk = k.shape[0]
    lsub = lq // subs
    mm_dtype = q_ref.dtype     # bf16 on TPU, fp32 in CPU-interpret tests

    keep = None
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, dropout_rate, n_heads, lq, lk, interpret)

    for i in range(subs):
        q0 = i * lsub
        # causal: sub-block i can only see keys < (i+1) * lsub
        kext = min((i + 1) * lsub, lk) if causal else lk
        q = q_ref[0, 0, q0:q0 + lsub, :]                     # [lsub, D]
        km_row = km_ref[0, :, :kext]                         # [1, kext]
        qm_col = qm_ref[0, :, q0:q0 + lsub].reshape(lsub, 1)
        pn = _probs(q, k[:kext], km_row, qm_col,
                    scale=scale, causal=causal, q0=q0, kext=kext)
        if keep is not None:
            pn = jnp.where(keep[q0:q0 + lsub, :kext],
                           pn / (1.0 - dropout_rate), 0.0)
        o = jax.lax.dot_general(
            pn.astype(mm_dtype), v[:kext], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [lsub, D]
        o_ref[0, 0, q0:q0 + lsub, :] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, qm_ref, km_ref, seed_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale: float, causal: bool, subs: int,
                dropout_rate: float, n_heads: int, interpret: bool):
    """Single-pass backward: dQ, dK, dV from ONE score recompute."""
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    lq = q_ref.shape[2]
    lk = k.shape[0]
    lsub = lq // subs
    mm_dtype = q_ref.dtype

    keep = None
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, dropout_rate, n_heads, lq, lk, interpret)

    dk_acc[...] = jnp.zeros((lk, k.shape[1]), jnp.float32)
    dv_acc[...] = jnp.zeros((lk, v.shape[1]), jnp.float32)

    for i in range(subs):
        q0 = i * lsub
        kext = min((i + 1) * lsub, lk) if causal else lk
        q = q_ref[0, 0, q0:q0 + lsub, :]
        do = do_ref[0, 0, q0:q0 + lsub, :]
        km_row = km_ref[0, :, :kext]
        qm_col = qm_ref[0, :, q0:q0 + lsub].reshape(lsub, 1)
        pn = _probs(q, k[:kext], km_row, qm_col,
                    scale=scale, causal=causal, q0=q0, kext=kext)
        # dPn = grad wrt the normalized, pre-dropout probs: the keep mask
        # and 1/(1-rate) chain through O = drop(Pn) @ V
        dpn = jax.lax.dot_general(
            do, v[:kext], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if keep is not None:
            kp = keep[q0:q0 + lsub, :kext]
            inv = 1.0 / (1.0 - dropout_rate)
            dpn = jnp.where(kp, dpn * inv, 0.0)
            pv = jnp.where(kp, pn * inv, 0.0)  # post-dropout probs for dV
        else:
            pv = pn
        dv_acc[0:kext, :] += jax.lax.dot_general(
            pv.astype(mm_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # softmax backward: dS = Pn * (dPn - rowsum(Pn * dPn))
        delta = jnp.sum(pn * dpn, axis=-1, keepdims=True)
        ds = (pn * (dpn - delta)).astype(mm_dtype)           # [lsub, kext]
        dq_ref[0, 0, q0:q0 + lsub, :] = (jax.lax.dot_general(
            ds, k[:kext], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dk_acc[0:kext, :] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _specs(lq, lk, D):
    qspec = pl.BlockSpec((1, 1, lq, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, lk, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    # masks ride as [B, 1, L] so the (1, L) tail dims equal the array's
    # (Mosaic requires (8, 128)-divisible or full-dimension block tails)
    qmspec = pl.BlockSpec((1, 1, lq), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kmspec = pl.BlockSpec((1, 1, lk), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qspec, kspec, qmspec, kmspec, sspec


def _pick_subs(causal: bool, lq: int, lk: int, dropout_rate: float) -> int:
    """Causal q-sub-block count. Measured at [48,12,512,64] (v5e,
    results/attn_kernel_bench.jsonl): subs=1 6.87 ms, subs=2 7.24,
    subs=4 7.40 — the skipped off-diagonal MXU work doesn't pay because
    the kernel is VPU/memory-bound, while smaller sub-matmuls cost
    efficiency. Whole-row it is. (The dropout bit stream is generated as
    the full [Lq, Lk] block and row-sliced, so any subs choice keeps
    fwd/bwd bit-identical.)"""
    del causal, lq, lk, dropout_rate
    return 1


def _fwd(q, k, v, q_mask, kv_mask, seed, *, scale, causal, dropout_rate,
         subs, interpret):
    B, H, lq, D = q.shape
    lk = k.shape[2]
    qspec, kspec, qmspec, kmspec, sspec = _specs(lq, lk, D)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, subs=subs,
        dropout_rate=dropout_rate, n_heads=H, interpret=interpret)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[qspec, kspec, kspec, qmspec, kmspec, sspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, q_mask, kv_mask, seed)


def _bwd(q, k, v, do, q_mask, kv_mask, seed, *, scale, causal,
         dropout_rate, subs, interpret):
    B, H, lq, D = q.shape
    lk = k.shape[2]
    qspec, kspec, qmspec, kmspec, sspec = _specs(lq, lk, D)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, causal=causal, subs=subs,
        dropout_rate=dropout_rate, n_heads=H, interpret=interpret)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[qspec, kspec, kspec, qspec, qmspec, kmspec, sspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((lk, D), jnp.float32),
                        pltpu.VMEM((lk, D), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, q_mask, kv_mask, seed)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _block_attention(q, k, v, q_mask, kv_mask, seed,
                     scale, causal, dropout_rate, interpret):
    subs = _pick_subs(causal, q.shape[2], k.shape[2], dropout_rate)
    return _fwd(q, k, v, q_mask, kv_mask, seed, scale=scale, causal=causal,
                dropout_rate=dropout_rate, subs=subs, interpret=interpret)


def _block_attention_fwd(q, k, v, q_mask, kv_mask, seed,
                         scale, causal, dropout_rate, interpret):
    o = _block_attention(q, k, v, q_mask, kv_mask, seed,
                         scale, causal, dropout_rate, interpret)
    return o, (q, k, v, q_mask, kv_mask, seed)


def _block_attention_bwd(scale, causal, dropout_rate, interpret, res, do):
    q, k, v, q_mask, kv_mask, seed = res
    subs = _pick_subs(causal, q.shape[2], k.shape[2], dropout_rate)
    dq, dk, dv = _bwd(q, k, v, do, q_mask, kv_mask, seed, scale=scale,
                      causal=causal, dropout_rate=dropout_rate, subs=subs,
                      interpret=interpret)
    return dq, dk, dv, None, None, None


_block_attention.defvjp(_block_attention_fwd, _block_attention_bwd)


def block_attention_supported(q, k, v, *, causal: bool,
                              causal_offset=0) -> bool:
    """Shapes this kernel serves: whole-sequence problems that fit VMEM.

    Callers fall back to the library flash kernel / XLA outside this set.
    """
    B, H, lq, D = q.shape
    lk = k.shape[2]
    if D > 128 or D % 8:
        return False
    if lq % 128 or lk % 128 or lq < 128:
        return False
    if lq > 1024 or lk > 1024:  # VMEM budget: fp32 [L, L] + operands
        return False
    if causal:
        if lq != lk:
            return False
        try:
            if int(causal_offset) != 0:
                return False
        except TypeError:
            return False
    return True


def block_mha(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    *,
    causal: bool,
    scale: Optional[float] = None,
    q_mask: Optional[jnp.ndarray] = None,   # [B, Lq] 1=real
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Lk] 1=real
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # int32 scalar
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused block attention (see module docstring)."""
    B, H, lq, D = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    if q_mask is None:
        q_mask = jnp.ones((B, lq), jnp.int32)
    if kv_mask is None:
        kv_mask = jnp.ones((B, lk), jnp.int32)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (jnp.zeros((1, 1), jnp.int32) if dropout_seed is None
            else jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))
    return _block_attention(q, k, v,
                            q_mask.astype(jnp.int32)[:, None, :],
                            kv_mask.astype(jnp.int32)[:, None, :], seed,
                            float(scale), bool(causal), float(dropout_rate),
                            bool(interpret))
