"""Fused softmax cross-entropy over the tied vocab projection (Pallas TPU).

The training loss needs exactly two numbers per token — logsumexp over
the vocab and the gold logit — yet computing them through a plain
matmul materializes [tokens, V] logits in HBM (fp32 at V=50k: gigabytes
per step), and the backward pass materializes the same-shaped dlogits.
Round 1's chunked_lm_loss (models/gpt2.py) bounded the LIVE memory but
still paid the HBM traffic; the train-step ablation
(results/train_ablation.jsonl) measured it at ~130 ms of a 479 ms
B=64xL=512 step — 2.5x its ~51 ms FLOP cost.

This kernel never materializes logits:

- forward: grid (token blocks x vocab blocks), s = h @ W^T on the MXU in
  fp32, online logsumexp in VMEM scratch, gold logit picked by label
  match; outputs per-token nll and logz,
- backward (custom VJP): two kernels recompute s block-by-block and
  accumulate each gradient in VMEM scratch over their INNER grid dim
  (dh over vocab blocks, dW over token blocks) — no [tokens, V]
  intermediate ever exists, and no cross-visit output accumulation is
  needed.

Numerics: fp32 accumulation throughout; equals the dense/chunked path
to fp32 tolerance (tests/test_fused_ce.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fwd_kernel(h_ref, w_ref, lbl_ref, nll_ref, logz_ref,
                m_ref, l_ref, g_ref, *, v_total: int, block_v: int):
    v = pl.program_id(1)
    num_v = pl.num_programs(1)

    @pl.when(v == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        g_ref[...] = jnp.zeros_like(g_ref)

    h = h_ref[...]                       # [BN, D]
    w = w_ref[...]                       # [BV, D]
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BN, BV]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + v * block_v
    s = jnp.where(col < v_total, s, _NEG)

    lbl = lbl_ref[...]                   # [BN, 1]
    g_ref[:, :1] += jnp.sum(jnp.where(col == lbl, s, 0.0), axis=1, keepdims=True)

    m_prev = m_ref[:, :1]
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    l_ref[:, :1] = (l_ref[:, :1] * jnp.exp(m_prev - m_next)
                    + jnp.sum(jnp.exp(s - m_next), axis=1, keepdims=True))
    m_ref[:, :1] = m_next

    @pl.when(v == num_v - 1)
    def _finish():
        logz = m_ref[:, :1] + jnp.log(jnp.maximum(l_ref[:, :1], 1e-30))
        logz_ref[...] = logz
        nll_ref[...] = logz - g_ref[:, :1]


def _padj(h_ref, w_ref, lbl_ref, logz_ref, gw_ref, v, *, v_total, block_v):
    """Recompute the weighted softmax-grad block (p - onehot) * gw."""
    h = h_ref[...]                       # [BN, D]
    w = w_ref[...]                       # [BV, D]
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BN, BV]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + v * block_v
    gw = gw_ref[...]                     # [BN, 1] per-token cotangent
    p = jnp.where(col < v_total,
                  jnp.exp(s - logz_ref[...]), 0.0) * gw
    return p - jnp.where(col == lbl_ref[...], gw, 0.0)  # [BN, BV]


def _bwd_dh_kernel(h_ref, w_ref, lbl_ref, logz_ref, gw_ref, dh_ref,
                   acc, *, v_total: int, block_v: int):
    v = pl.program_id(1)
    padj = _padj(h_ref, w_ref, lbl_ref, logz_ref, gw_ref, v,
                 v_total=v_total, block_v=block_v)
    # grad matmuls run at the activation dtype (bf16 on TPU: native MXU
    # rate; fp32 inputs in the parity tests stay fp32), fp32 accumulate
    delta = jax.lax.dot_general(padj.astype(h_ref.dtype), w_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    @pl.when(v == 0)
    def _init():
        acc[...] = delta

    @pl.when(v > 0)
    def _acc():
        acc[...] += delta

    @pl.when(v == pl.num_programs(1) - 1)
    def _write():
        dh_ref[...] = acc[...]


def _bwd_dw_kernel(h_ref, w_ref, lbl_ref, logz_ref, gw_ref, dw_ref,
                   acc, *, v_total: int, block_v: int):
    v = pl.program_id(0)
    n = pl.program_id(1)
    padj = _padj(h_ref, w_ref, lbl_ref, logz_ref, gw_ref, v,
                 v_total=v_total, block_v=block_v)
    delta = jax.lax.dot_general(padj.astype(h_ref.dtype), h_ref[...],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    @pl.when(n == 0)
    def _init():
        acc[...] = delta

    @pl.when(n > 0)
    def _acc():
        acc[...] += delta

    @pl.when(n == pl.num_programs(1) - 1)
    def _write():
        dw_ref[...] = acc[...]


def _pad_to(x, n, axis, value):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _resolve_block_v(block_v, d):
    """Tiling swept on v5e at the training shape (scripts/ce_block_sweep.py,
    results/ce_block_sweep.jsonl): block_v=2048 is ~5% faster than 1024
    at D=768 and fits every kernel's 16 MB scoped-VMEM budget, but the
    dW backward (acc + output blocks scale with (block_v/2)*D) exceeds
    it at D=1024 by 3.84 MB -- wider models keep 1024, and past D=1280
    even that overflows (D=1600 measured 96 KB over), so XL-width
    models halve again."""
    if block_v is not None:
        return block_v
    if d <= 768:
        return 2048
    return 1024 if d <= 1280 else 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_softmax_xent(hidden, wte, labels,
                       block_n: int = 256, block_v=None,
                       interpret: bool = False):
    """Per-token NLL of ``labels`` under softmax(hidden @ wte^T).

    hidden [N, D] (any float dtype), wte [V, D], labels [N] int32
    (negative = ignored -> garbage nll, zero gradient; callers mask).
    Returns nll [N] fp32. Differentiable in hidden and wte.
    """
    nll, _ = _fwd_impl(hidden, wte, labels, block_n, block_v, interpret)
    return nll


def _fwd_impl(hidden, wte, labels, block_n, block_v, interpret):
    N, D = hidden.shape
    V = wte.shape[0]
    block_v = _resolve_block_v(block_v, D)
    bn = min(block_n, max(N, 8))
    Np = -(-N // bn) * bn
    Vp = -(-V // block_v) * block_v
    h = _pad_to(hidden, Np, 0, 0)
    w = _pad_to(wte, Vp, 0, 0)
    # per-token vectors ride as [Np, 1]: a (bn, 1) block keeps the last
    # dim equal to the array dim (TPU block rule) and sidesteps 1-D
    # XLA/Mosaic layout disagreements (T(512) vs T(256) tiling)
    lbl = _pad_to(labels.astype(jnp.int32), Np, 0, -100)[:, None]

    kernel = functools.partial(_fwd_kernel, v_total=V, block_v=block_v)
    nll, logz = pl.pallas_call(
        kernel,
        grid=(Np // bn, Vp // block_v),
        in_specs=[
            pl.BlockSpec((bn, D), lambda n, v: (n, 0)),
            pl.BlockSpec((block_v, D), lambda n, v: (v, 0)),
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.float32),
            pltpu.VMEM((bn, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(h, w, lbl)
    return nll[:N, 0], logz[:N, 0]


def _vjp_fwd(hidden, wte, labels, block_n, block_v, interpret):
    nll, logz = _fwd_impl(hidden, wte, labels, block_n, block_v, interpret)
    return nll, (hidden, wte, labels, logz)


def _vjp_bwd(block_n, block_v, interpret, res, g):
    hidden, wte, labels, logz = res
    N, D = hidden.shape
    V = wte.shape[0]
    block_v = _resolve_block_v(block_v, D)
    bn = min(block_n, max(N, 8))
    Np = -(-N // bn) * bn
    Vp = -(-V // block_v) * block_v
    h = _pad_to(hidden, Np, 0, 0)
    w = _pad_to(wte, Vp, 0, 0)
    lbl = _pad_to(labels.astype(jnp.int32), Np, 0, -100)[:, None]
    # padded rows: gw = 0 -> zero contribution
    gw = _pad_to(g.astype(jnp.float32), Np, 0, 0)[:, None]
    lz = _pad_to(logz, Np, 0, 0)[:, None]

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, v_total=V, block_v=block_v),
        grid=(Np // bn, Vp // block_v),
        in_specs=[
            pl.BlockSpec((bn, D), lambda n, v: (n, 0)),
            pl.BlockSpec((block_v, D), lambda n, v: (v, 0)),
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
            pl.BlockSpec((bn, 1), lambda n, v: (n, 0)),
        ],
        out_specs=pl.BlockSpec((bn, D), lambda n, v: (n, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(h, w, lbl, lz, gw)
    # the dW kernel carries a [block, D] fp32 accumulator + fp32 output
    # block on top of the double-buffered inputs; at the forward's vocab
    # block it exceeds the 16 MB scoped-VMEM limit (block_v=1024/D=768
    # measured 88 KB over), so it runs at half the forward/dh vocab
    # block, capped at 512: bvw=1024/D=768 compiles in the plain train
    # step but tips 344 KB over once the optimizer carries a MultiSteps
    # grad accumulator (measured) — right at the edge is not a default
    bvw = max(128, min(block_v // 2, 512))
    Vpw = -(-V // bvw) * bvw
    w_w = _pad_to(wte, Vpw, 0, 0)
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, v_total=V, block_v=bvw),
        grid=(Vpw // bvw, Np // bn),
        in_specs=[
            pl.BlockSpec((bn, D), lambda v, n: (n, 0)),
            pl.BlockSpec((bvw, D), lambda v, n: (v, 0)),
            pl.BlockSpec((bn, 1), lambda v, n: (n, 0)),
            pl.BlockSpec((bn, 1), lambda v, n: (n, 0)),
            pl.BlockSpec((bn, 1), lambda v, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((bvw, D), lambda v, n: (v, 0)),
        out_shape=jax.ShapeDtypeStruct((Vpw, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bvw, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(h, w_w, lbl, lz, gw)
    return (dh[:N].astype(hidden.dtype), dw[:V].astype(wte.dtype), None)


fused_softmax_xent.defvjp(_vjp_fwd, _vjp_bwd)


def _masked_nll_sums(hidden, wte, labels, ignore_index, block_n, block_v,
                     interpret):
    """(sum of shifted per-token NLL over real targets, target count)."""
    B, L, D = hidden.shape
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), ignore_index, labels.dtype)], axis=1)
    flat_h = hidden.reshape(B * L, D)
    flat_l = shifted.reshape(B * L)
    nll = fused_softmax_xent(flat_h, wte, flat_l, block_n, block_v, interpret)
    mask = (flat_l != ignore_index).astype(jnp.float32)
    return jnp.sum(nll * mask), jnp.sum(mask)


def fused_lm_loss(hidden: jnp.ndarray, wte: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: int = -100,
                  block_n: int = 256, block_v=None,
                  interpret: bool = False) -> jnp.ndarray:
    """Shifted LM cross-entropy via the fused kernel — drop-in for
    models.gpt2.chunked_lm_loss (same semantics: position t scored
    against labels[t+1], mean over non-ignored targets)."""
    s, n = _masked_nll_sums(hidden, wte, labels, ignore_index,
                            block_n, block_v, interpret)
    return s / jnp.maximum(n, 1.0)


def fused_lm_loss_sharded(hidden: jnp.ndarray, wte: jnp.ndarray,
                          labels: jnp.ndarray, mesh,
                          ignore_index: int = -100,
                          block_n: int = 256, block_v=None,
                          interpret: bool = False,
                          data_axis: str = "data") -> jnp.ndarray:
    """fused_lm_loss under SPMD: shard_map over the mesh data axis.

    An opaque pallas_call under pjit makes the partitioner replicate its
    operands; shard_map instead runs the kernel per data shard and psums
    the masked NLL/count sums, so the loss (and, through shard_map's
    transpose, the replicated-wte gradient) matches the unsharded value.
    Restricted to pure data-parallel meshes: with check-replication off,
    a non-trivial model axis would double-psum the wte cotangent.
    """
    nontrivial = [a for a in mesh.axis_names
                  if a != data_axis and mesh.shape[a] > 1]
    if data_axis not in mesh.axis_names or nontrivial:
        raise ValueError(
            f"fused_lm_loss_sharded needs a pure '{data_axis}' mesh; "
            f"got axes {dict(mesh.shape)} (use the chunked loss under TP)")

    def local(h, w, l):
        s, n = _masked_nll_sums(h, w, l, ignore_index, block_n, block_v,
                                interpret)
        s = jax.lax.psum(s, data_axis)
        n = jax.lax.psum(n, data_axis)
        return s / jnp.maximum(n, 1.0)

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis), P(), P(data_axis)),
        out_specs=P(), check_vma=False,
    )(hidden, wte, labels)
