"""Fused decode-trunk kernels (Pallas, single-token step).

The round-4 device trace (results/decode_trace.jsonl) shows the B=256
decode step's 1.99 ms trunk is a DIFFUSE floor of 20-70 us XLA fusions
— per layer: two LN stat reductions, the LN applies, the MLP up/down
GEMMs and the residual adds each dispatch separately. This module fuses
the post-attention tail of a GPT-2 block

    out = h + mlp(layer_norm(h, ln2))        (gpt2.py block(), decode)

into ONE Pallas program per layer step: LN statistics and apply, the
[B, D] x [D, 4D] up-projection, GELU, the [B, 4D] x [4D, D] down-
projection, and the residual — weights stream HBM->VMEM once, every
intermediate lives in VMEM/registers. Math mirrors gpt2.dense /
gpt2.layer_norm exactly (f32 LN statistics, f32 MXU accumulation +
f32 bias, activations cast back to bf16 between stages) so results
match the unfused composition to bf16 rounding.

Used only when ``config.decode_fused_mlp`` is set AND the shape fits
VMEM (D=768/1024 families); anything else falls back to the unfused
path. Weight-quantized (int8) params fall back too — their dequant
already fuses into the XLA matmul read.

MEASURED (v5e, B=256 headline, round 4): the fusion is NOT a win as a
sublayer drop-in — 441-443 utt/s vs 449-450 unfused, in BOTH
formulations tried (single-block: serial 9.4 MB weight DMA before
compute; F-tiled grid with double-buffered weight streams: ~47 vs
XLA's ~41 us/layer). The per-``pallas_call`` launch cost and the loss
of XLA's cross-op overlap (attention compute hides part of the MLP
weight stream in the unfused program) exceed the ~15 us/layer compute
bound of what the kernel saves. The trace-measured diffuse trunk floor
(README "Device trace") therefore needs a WHOLE-layer fusion —
attention included, one launch per layer — to amortize entry cost;
this module is the measured groundwork and stays default-off.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = None  # resolved lazily: True off-TPU (tests), False on TPU


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


def _kernel(h_ref, scale_ref, bias_ref, wfc_ref, bfc_ref, wpr_ref, bpr_ref,
            out_ref, y_ref, acc_ref, *, eps: float, approximate: bool):
    """One F-tile of the streamed LN+MLP+residual pipeline.

    Grid over the hidden dimension F: step t loads weight tiles
    wfc[:, tF:(t+1)F] and wpr[tF:(t+1)F, :] (Mosaic double-buffers the
    HBM->VMEM streams across grid steps, overlapping with the MXU),
    computes that tile's up-projection + GELU, and accumulates its
    down-projection contribution in an f32 scratch. The LN input is
    computed once (step 0) into scratch; the final step adds the
    down-bias + residual and writes bf16."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        # LN2: f32 statistics (gpt2.layer_norm), computed once
        xf = h_ref[:].astype(jnp.float32)                # [B, D]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y_ref[:] = (y * scale_ref[:] + bias_ref[:]).astype(h_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # up-projection tile (gpt2.dense: f32 accum, f32 bias, cast back)
    u = jnp.dot(y_ref[:], wfc_ref[:], preferred_element_type=jnp.float32)
    u = (u + bfc_ref[:]).astype(h_ref.dtype)
    a = jax.nn.gelu(u, approximate=approximate)
    # down-projection contribution, f32 accumulation across tiles
    acc_ref[:] += jnp.dot(a, wpr_ref[:], preferred_element_type=jnp.float32)

    @pl.when(t == nt - 1)
    def _():
        d = (acc_ref[:] + bpr_ref[:]).astype(h_ref.dtype)
        out_ref[:] = h_ref[:] + d


def _tile_f(F: int) -> int:
    for t in (768, 1024, 512, 640, 384, 256):
        if F % t == 0:
            return t
    return F


@functools.partial(jax.jit, static_argnames=("eps", "approximate"))
def _call(h, scale, bias, wfc, bfc, wpr, bpr, *, eps, approximate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = h.shape
    F = wfc.shape[-1]
    TF = _tile_f(F)
    kern = functools.partial(_kernel, eps=eps, approximate=approximate)
    full = lambda *_: (0, 0)
    grid = (F // TF,)
    in_specs = [
            pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),     # h
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),     # scale
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),     # bias
            pl.BlockSpec((D, TF), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                   # wfc tile
            pl.BlockSpec((1, TF), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                   # bfc tile
            pl.BlockSpec((TF, D), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),                   # wpr tile
            pl.BlockSpec((1, D), full, memory_space=pltpu.VMEM),     # bpr
    ]
    flops = 2 * B * D * F * 2
    bytes_acc = (2 * D * F) * wfc.dtype.itemsize + 2 * B * D * h.dtype.itemsize
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, D), h.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, D), h.dtype),        # y (LN output)
            pltpu.VMEM((B, D), jnp.float32),    # down-proj accumulator
        ],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=B * F),
        interpret=_interpret(),
    )(h, scale, bias, wfc, bfc, wpr, bpr)


def supported(h, mlp_p, config) -> bool:
    """Shape/dtype gate: single-token rows, unquantized weights, and the
    whole working set (both MLP weights + a [B, 4D] intermediate) within
    a conservative VMEM budget."""
    if h.ndim != 3 or h.shape[1] != 1:
        return False
    if config.activation not in ("gelu_new", "gelu"):
        return False
    if "kernel_q" in mlp_p["c_fc"]:
        return False  # int8 weights: XLA's fused dequant-read path stays
    D = h.shape[-1]
    F = mlp_p["c_fc"]["kernel"].shape[-1]
    B = h.shape[0]
    if D % 128 or F % 128 or B % 8:
        return False
    # streamed pipeline working set: residual input + LN scratch (bf16),
    # f32 accumulator, double-buffered weight tiles, one f32 [B, TF]
    # up-projection tile
    TF = _tile_f(F)
    tiles = 2 * (D * TF + TF * D) * 2           # two tiles, double-buffered
    act = 2 * B * D * 2 + B * D * 4 + B * TF * 4
    return (tiles + act) <= 13 * 1024 * 1024


def fused_ln_mlp(h, ln_p, mlp_p, config):
    """``h + mlp(layer_norm(h, ln_p))`` for decode steps, one kernel.

    ``h``: [B, 1, D]; returns the same shape. Caller checks
    ``supported`` first.
    """
    B, L, D = h.shape
    out = _call(
        h[:, 0, :],
        # (1, D)/(1, F) operands: 1-D arrays hit TPU lane-tiling edge
        # cases; 2-D broadcasts cleanly against the [B, *] activations
        ln_p["scale"].astype(jnp.float32).reshape(1, D),
        ln_p["bias"].astype(jnp.float32).reshape(1, D),
        mlp_p["c_fc"]["kernel"].astype(h.dtype),
        mlp_p["c_fc"]["bias"].astype(jnp.float32).reshape(1, -1),
        mlp_p["c_proj"]["kernel"].astype(h.dtype),
        mlp_p["c_proj"]["bias"].astype(jnp.float32).reshape(1, D),
        eps=float(config.layer_norm_epsilon),
        approximate=config.activation == "gelu_new",
    )
    return out[:, None, :]
