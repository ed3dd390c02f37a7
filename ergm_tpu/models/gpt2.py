"""ERGM GPT-2 backbone — pure-functional JAX, TPU-first.

Re-implements the capability of the reference's modified GPT-2
(reference: src/model.py) as a pure function over an explicit parameter
pytree, designed for XLA:

- layer stack as a single ``lax.scan`` over stacked per-layer params
  (one trace, one compile, remat-friendly; the reference loops Python
  modules — src/model.py:520-576),
- attention via ergm_tpu/ops/attention.py (Pallas flash kernel on TPU),
- fp32 softmax/loss on top of bf16 activations,
- KV-cached decode with fixed-size buffers (the reference re-runs the
  full prefix per generated token — src/main.py:255-257, SURVEY.md
  §2.4.11),
- optional per-block cross-attention over caption-token embeddings
  shared through ``wte`` (src/model.py:460-463, 311-329), actually
  optional here (fixes the reference NameError, SURVEY.md §2.4.2),
- multimodal injection: image feature added to the position-0 embedding,
  audio to position 1 (src/model.py:495-498), with a learned projection
  when the feature dim mismatches ``n_embd`` (fixes SURVEY.md §2.4.12),
- 7-way emotion head on the final hidden state with joint LM+emotion CE
  loss (src/model.py:607-608, 700-713),
- ``lm_head`` weight-tied to ``wte`` (src/model.py:600).

Param pytree layout (block params stacked over the layer axis L):

    wte/embedding [V, D]          wpe/embedding [P, D]
    blocks/ln_1/{scale,bias} [L, D]
    blocks/attn/{c_attn,c_proj}/{kernel,bias}     kernels [L, D, 3D] / [L, D, D]
    blocks/ln_cross/{scale,bias}                  (cross-attn only)
    blocks/cross_attn/{q_attn,c_attn,c_proj}/...  kernels [L,D,D]/[L,D,2D]/[L,D,D]
    blocks/ln_2/{scale,bias}
    blocks/mlp/{c_fc,c_proj}/{kernel,bias}        kernels [L, D, 4D] / [L, 4D, D]
    ln_f/{scale,bias} [D]
    emotion_head/kernel [D, 7]
    img_proj|aud_proj/{kernel,bias}               (only when modality_dim != n_embd)

Kernels use the GPT-2 Conv1D orientation (in_features, out_features), so
HF Conv1D weights convert with a straight copy and nn.Linear weights
(emotion head) with a transpose (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.ops import cross_decode, prefill_attention
from ergm_tpu.ops.attention import multihead_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _normal(rng, shape, std):
    return jax.random.normal(rng, shape, dtype=jnp.float32) * std


def init_params(rng: jax.Array, config: ModelConfig) -> Params:
    """Random init matching the reference (src/model.py:359-375): N(0, 0.02)
    for linears/embeddings, zero biases, unit layernorm scales, and the
    GPT-2 residual-projection init std 0.02/sqrt(2*n_layer) for every
    ``c_proj``."""
    c = config
    L, D, I, V = c.n_layer, c.n_embd, c.inner_dim, c.vocab_size
    std = c.initializer_range
    proj_std = std / (2 * c.n_layer) ** 0.5
    keys = iter(jax.random.split(rng, 16))

    def ln(shape=(L, D)):
        return {"scale": jnp.ones(shape, jnp.float32), "bias": jnp.zeros(shape, jnp.float32)}

    params: Params = {
        "wte": {"embedding": _normal(next(keys), (V, D), std)},
        "wpe": {"embedding": _normal(next(keys), (c.n_positions, D), std)},
        "blocks": {
            "ln_1": ln(),
            "attn": {
                "c_attn": {"kernel": _normal(next(keys), (L, D, 3 * D), std),
                           "bias": jnp.zeros((L, 3 * D), jnp.float32)},
                "c_proj": {"kernel": _normal(next(keys), (L, D, D), proj_std),
                           "bias": jnp.zeros((L, D), jnp.float32)},
            },
            "ln_2": ln(),
            "mlp": {
                "c_fc": {"kernel": _normal(next(keys), (L, D, I), std),
                         "bias": jnp.zeros((L, I), jnp.float32)},
                "c_proj": {"kernel": _normal(next(keys), (L, I, D), proj_std),
                           "bias": jnp.zeros((L, D), jnp.float32)},
            },
        },
        "ln_f": {"scale": jnp.ones((D,), jnp.float32), "bias": jnp.zeros((D,), jnp.float32)},
        "emotion_head": {"kernel": _normal(next(keys), (D, c.num_emotions), std)},
    }
    if c.use_cross_attention:
        params["blocks"]["ln_cross"] = ln()
        params["blocks"]["cross_attn"] = {
            "q_attn": {"kernel": _normal(next(keys), (L, D, D), std),
                       "bias": jnp.zeros((L, D), jnp.float32)},
            "c_attn": {"kernel": _normal(next(keys), (L, D, 2 * D), std),
                       "bias": jnp.zeros((L, 2 * D), jnp.float32)},
            "c_proj": {"kernel": _normal(next(keys), (L, D, D), proj_std),
                       "bias": jnp.zeros((L, D), jnp.float32)},
        }
    if c.modality_dim != c.n_embd:
        for name in ("img_proj", "aud_proj"):
            params[name] = {"kernel": _normal(next(keys), (c.modality_dim, D), std),
                            "bias": jnp.zeros((D,), jnp.float32)}
    return params


def prune_heads(params: Params, config: ModelConfig,
                heads_to_prune: Dict[int, list]) -> tuple:
    """Remove attention heads from self-attention layers
    (reference: src/model.py:106-117, 416-418).

    Returns (new_params, new_config) where every layer keeps
    ``n_head - max_pruned`` heads (the stacked-layer format needs a
    uniform head count, so each listed layer must prune the same number
    of heads; the reference prunes per-layer independently — with a
    scan-stacked pytree the uniform variant is the expressible one).
    Pruned layers drop the chosen heads; unlisted layers drop their
    highest-indexed heads to stay uniform.
    """
    import numpy as np

    c = config
    counts = {len(v) for v in heads_to_prune.values()}
    if len(counts) != 1:
        raise ValueError("stacked-layer pruning needs the same number of "
                         "pruned heads per listed layer")
    n_drop = counts.pop()
    new_heads = c.n_head - n_drop
    hd = c.head_dim

    keep_per_layer = []
    default_keep = list(range(new_heads))  # unlisted layers keep the first heads
    for layer in range(c.n_layer):
        pruned = set(heads_to_prune.get(layer, []))
        if pruned:
            keep = [h for h in range(c.n_head) if h not in pruned]
        else:
            keep = default_keep
        keep_per_layer.append(keep)

    attn = params["blocks"]["attn"]
    ck = np.asarray(attn["c_attn"]["kernel"])  # [L, D, 3D]
    cb = np.asarray(attn["c_attn"]["bias"])    # [L, 3D]
    pk = np.asarray(attn["c_proj"]["kernel"])  # [L, D, D]
    D = c.n_embd

    new_ck = np.empty((c.n_layer, D, 3 * new_heads * hd), ck.dtype)
    new_cb = np.empty((c.n_layer, 3 * new_heads * hd), cb.dtype)
    new_pk = np.empty((c.n_layer, new_heads * hd, D), pk.dtype)
    for li, keep in enumerate(keep_per_layer):
        cols = np.concatenate([np.arange(h * hd, (h + 1) * hd) for h in keep])
        qkv_cols = np.concatenate([cols, D + cols, 2 * D + cols])
        new_ck[li] = ck[li][:, qkv_cols]
        new_cb[li] = cb[li][qkv_cols]
        new_pk[li] = pk[li][cols, :]

    import jax.numpy as jnp

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out["blocks"] = dict(params["blocks"])
    out["blocks"]["attn"] = {
        "c_attn": {"kernel": jnp.asarray(new_ck), "bias": jnp.asarray(new_cb)},
        "c_proj": {"kernel": jnp.asarray(new_pk), "bias": attn["c_proj"]["bias"]},
    }
    # n_embd stays; attention now operates on new_heads*hd features, so the
    # head dim must be pinned explicitly rather than derived from n_embd
    new_cfg = c.replace(n_head=new_heads, head_dim_override=hd,
                        n_inner=c.inner_dim)
    return out, new_cfg


def params_for_inference(params: Params, config: ModelConfig) -> Params:
    """Cast floating-point weights to the compute dtype for serving.

    Training keeps fp32 masters (the optimizer needs them), but serving
    fp32 weights doubles their HBM residency and leaves the per-use
    bf16 converts to XLA's discretion — measured 1.9x decode throughput
    on gpt2-medium where the 350M-param weight reads dominate."""
    if config.weight_dtype in ("int8", "int8_lm_head"):
        params = quantize_params_int8(params, config)
    dt = config.compute_dtype
    return jax.tree_util.tree_map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params)


def _quantize_kernel(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8 over the input (contraction) dim.

    Stacked-layer kernels [L, in, out] get per-(layer, out) scales."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=-2, keepdims=True) / 127.0,
                        1e-8)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_params_int8(params: Params, config: ModelConfig) -> Params:
    """Weight-only int8 for serving (``ModelConfig.weight_dtype='int8'``).

    Replaces every ``dense`` kernel (attention qkv/proj, cross-attention,
    MLP, modality projections) with ``kernel_q`` int8 + per-out-channel
    ``kernel_scale`` (``dense`` dequantizes inside the matmul fusion),
    and ``wte`` with ``embedding_q`` int8 + per-row ``embedding_scale``
    (``embed_rows`` gathers + rescales; the tied lm_head applies the
    per-vocab-row scale on the logits). ``wpe``, LayerNorms, biases and
    the emotion head stay in the compute dtype. Quantize from the
    highest-precision checkpoint available (call before any bf16 cast —
    params_for_inference orders this correctly). Under TP,
    core/mesh.py's partition specs shard kernel_q/kernel_scale along
    the same axes as the fp kernels they replace.

    ``weight_dtype="int8_lm_head"`` quantizes ONLY ``wte`` — the tied
    lm_head is the single largest per-step decode weight read (77 MB
    bf16 at gpt2's 50k vocab; the device trace's greedy matvec+argmax
    fusion reads it at 0.17 ms/step) — while the trunk kernels stay
    bf16, avoiding the dequant overhead that made full int8 a wash at
    large batch (round 3)."""
    skip = {"wpe", "emotion_head"}
    lm_head_only = config.weight_dtype == "int8_lm_head"

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in skip:
                return node
            if name == "wte":
                emb = node["embedding"].astype(jnp.float32)
                s = jnp.maximum(
                    jnp.max(jnp.abs(emb), axis=-1, keepdims=True) / 127.0, 1e-8)
                q = jnp.clip(jnp.round(emb / s), -127, 127).astype(jnp.int8)
                return {"embedding_q": q,
                        "embedding_scale": s.astype(config.compute_dtype)}
            if (not lm_head_only and "kernel" in node
                    and getattr(node["kernel"], "ndim", 0) >= 2):
                q, s = _quantize_kernel(node["kernel"])
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = q
                out["kernel_scale"] = s.astype(config.compute_dtype)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def embed_rows(wte_p, ids, dtype):
    """Row gather from the (possibly int8-quantized) tied vocab table."""
    if "embedding_q" in wte_p:
        rows = jnp.take(wte_p["embedding_q"], ids, axis=0).astype(dtype)
        return rows * jnp.take(wte_p["embedding_scale"], ids, axis=0).astype(dtype)
    return jnp.take(wte_p["embedding"], ids, axis=0).astype(dtype)


def wte_dense(wte_p, dtype):
    """The dense [V, D] vocab table (dequantized if int8) — loss paths."""
    if "embedding_q" in wte_p:
        return (wte_p["embedding_q"].astype(dtype)
                * wte_p["embedding_scale"].astype(dtype))
    return wte_p["embedding"].astype(dtype)


def resize_token_embeddings(params: Params, rng: jax.Array, new_vocab: int,
                            config: ModelConfig) -> Params:
    """Extend ``wte`` rows for added special tokens, like HF
    ``resize_token_embeddings`` (reference: src/main.py:63). New rows are
    N(0, initializer_range); ``lm_head`` stays tied so nothing else moves."""
    wte = params["wte"]["embedding"]
    old_vocab = wte.shape[0]
    if new_vocab <= old_vocab:
        return params
    extra = _normal(rng, (new_vocab - old_vocab, wte.shape[1]), config.initializer_range)
    out = dict(params)
    out["wte"] = {"embedding": jnp.concatenate([wte, extra], axis=0)}
    return out


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def layer_norm(x, p, eps):
    # fp32 statistics for bf16 stability
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dense(x, p):
    """GPT-2 Conv1D: y = x @ kernel + bias, kernel [in, out].

    fp32 MXU accumulation, result cast back to the activation dtype.
    precision='highest' pins fp32-input matmuls to true fp32 (XLA CPU's
    DEFAULT runs them in lower precision); bf16 inputs are unaffected, so
    the TPU fast path still uses bf16 MXU passes.

    int8 weight-only serving (quantize_params_int8) stores the kernel as
    ``kernel_q`` [in, out] int8 + ``kernel_scale`` [1, out]; the dequant
    (convert + per-channel mul) fuses into the matmul's weight read, so
    HBM weight traffic halves — the dominant cost of small-batch decode.
    """
    if "kernel_q" in p:
        w = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
    else:
        w = p["kernel"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision="highest")
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _activation(name: str):
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation {name!r}")


def _dropout(x, rate, deterministic, rng):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _split_heads(x, n_head):
    b, l, d = x.shape
    return x.reshape(b, l, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Fixed-size decode cache. ``k``/``v``: [L, B, H, T, Dh]; ``index``:
    int32 count of filled positions — a scalar (all rows aligned, the
    generate/beam layout) or a [B] vector (per-row write cursors: each
    row's K/V lives contiguously at [0, index[b]), single-token decode
    only — the continuous server's layout, where rows join and leave at
    different lengths). Cross-attention K/V are
    computed once per sequence and stored in ``ck``/``cv`` in merged-head
    layout [L, B, Lc, H*Dh] (tile-aligned minor dims — see init_kv_cache)
    — the reference recomputed them every step via its uncached loop.

    With ``kv_cache_dtype="int8"`` the self-attention cache stores int8
    values with per-(token, head) fp32 scales (``k_scale``/``v_scale``,
    [L, B, H, T, 1]) — roughly halving the cache-read bandwidth that
    dominates decode. Cross-attention K/V stay in the compute dtype:
    quantizing them was measured SLOWER on v5e (0.89 vs 0.68 ms/step of
    cross cost at B=128, Lc=32 — the dequant multiply doesn't fuse into
    the cross-attention read the way the self-attention path does), so
    ``ck_scale``/``cv_scale`` exist only for forward-compat and stay
    None."""

    k: jnp.ndarray
    v: jnp.ndarray
    index: jnp.ndarray
    ck: Optional[jnp.ndarray] = None
    cv: Optional[jnp.ndarray] = None
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None
    ck_scale: Optional[jnp.ndarray] = None
    cv_scale: Optional[jnp.ndarray] = None
    # Staged block-decode buffers (the continuous server's per-slot-
    # cursor mode, round 4): within one decode block, each step writes
    # its new K/V into ``sk``/``sv`` [L, B, H, Kblock, Dh] (compute
    # dtype) at the UNIFORM scalar step index — a cheap
    # dynamic_update_slice like the generate path — instead of the
    # per-row scatter that cost ~1.2 ms of every 12-layer step at S=64
    # (and compiled/ran pathologically for int8). Attention reads the
    # main cache (rows' flushed prefixes) concatenated with the staging
    # tail; the server's block program flushes staging into the main
    # cache ONCE per block. ``sk``/``sv`` are transient: None outside a
    # block program.
    sk: Optional[jnp.ndarray] = None
    sv: Optional[jnp.ndarray] = None


def _cross_scale_pad(config: ModelConfig) -> int:
    """Cross-cache scale buffers pad the head axis to the 128-lane tile
    (physically free: f32 minor-dim tiling pads to 128 in HBM anyway)."""
    return -(-config.n_head // 128) * 128


def init_kv_cache(config: ModelConfig, batch: int, max_len: int,
                  caption_len: int = 0, dtype=None,
                  per_row_index: bool = False) -> KVCache:
    c = config
    quant = c.kv_cache_dtype in ("int8", "int4")
    dtype = dtype or (jnp.int8 if quant else c.compute_dtype)
    # int4: two values hand-packed per int8 byte (see _quantize_kv)
    dm = c.head_dim // 2 if c.kv_cache_dtype == "int4" else c.head_dim
    shape = (c.n_layer, batch, c.n_head, max_len, dm)
    k = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    ks = vs = None
    if quant:
        # bf16 scales (see _quantize_kv): halves the per-step scale
        # buffer read and deletes the per-layer f32->bf16 convert
        import os as _os2
        sdt = (jnp.float32 if _os2.environ.get("ERGM_KV_SCALE_F32") == "1"
               else jnp.bfloat16)
        sshape = (c.n_layer, batch, c.n_head, max_len, 1)
        ks = jnp.zeros(sshape, sdt)
        vs = jnp.zeros(sshape, sdt)
    ck = cv = cks = cvs = None
    if c.use_cross_attention and caption_len > 0:
        # merged-head layout [L, B, Lc, H*Dh]: the minor dims (Lc, H*Dh)
        # are tile-aligned on TPU, unlike the per-head [..., Lc, Dh=64]
        # layout whose 64-lane minor dim gets padded to 128 — doubling
        # the cross-cache read traffic of every decode step (seen in the
        # compiled HLO layouts; the cache is read in full each step).
        cshape = (c.n_layer, batch, caption_len, c.n_head * c.head_dim)
        cquant = c.cross_kv_dtype == "int8"
        ck = jnp.zeros(cshape, jnp.int8 if cquant else c.compute_dtype)
        cv = jnp.zeros(cshape, jnp.int8 if cquant else c.compute_dtype)
        if cquant:
            # per-(token, head) scales, factored OUT of the lane-grouped
            # decode reductions (_cross_attention). The head axis is
            # EXPLICITLY padded to the 128-lane tile: a [.., Lc, H] f32
            # array already occupies [.., Lc, 128] bytes in TPU HBM
            # (minor-dim tiling), so the padding is physically free and
            # makes the buffer a legal Pallas block for the fused cross
            # decode kernel (ops/cross_decode.py), whose Mosaic tiling
            # rejects a 12-lane minor dim. Pad lanes stay zero; readers
            # slice [..., :H].
            csshape = (c.n_layer, batch, caption_len, _cross_scale_pad(c))
            cks = jnp.zeros(csshape, jnp.float32)
            cvs = jnp.zeros(csshape, jnp.float32)
    index = jnp.zeros((batch,) if per_row_index else (), jnp.int32)
    return KVCache(k=k, v=v, index=index, ck=ck, cv=cv,
                   k_scale=ks, v_scale=vs, ck_scale=cks, cv_scale=cvs)


def _quantize_kv(x: jnp.ndarray, bits: int = 8):
    """[..., D] -> (int8 values, bf16 scale [..., 1]).

    Scales are ROUNDED TO BF16 BEFORE the divide, then stored bf16
    (round 5): the decode step reads the whole scale buffer every step
    ([L, B, H, T, 1] — 38 MB f32 at the headline shape) and the XLA
    path spent two per-layer convert fusions turning it bf16 anyway;
    dividing by the already-rounded scale keeps dequantization error at
    the pure int8 level (the stored ints exactly invert through the
    stored scale).

    ``bits=4``: values quantize to [-7, 7] and PACK two per byte into
    [..., D//2] int8 — the native jnp.int4 dtype cannot transfer
    through the axon device runtime (materializing any int4 array
    recursion-faults), so 4-bit storage is hand-packed. Packing is
    halves-based (low nibbles hold x[..., :D/2], high nibbles
    x[..., D/2:]) so _unpack_int4's concat restores the original
    element order with no interleave shuffle."""
    import os as _os2
    sdt = (jnp.float32 if _os2.environ.get("ERGM_KV_SCALE_F32") == "1"
           else jnp.bfloat16)  # A/B escape hatch (trace-time)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    lim = 127.0 if bits == 8 else 7.0
    scale = (amax / lim).astype(sdt)
    safe = jnp.where(scale == 0.0, 1.0, scale.astype(jnp.float32))
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / safe),
                 -lim, lim).astype(jnp.int8)
    if bits == 4:
        q = _pack_int4(q)
    return q, scale


def _pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-7, 7], [..., D] -> [..., D//2] two-per-byte."""
    D = q.shape[-1]
    lo = q[..., : D // 2] & jnp.int8(15)
    hi = q[..., D // 2:] << jnp.int8(4)
    return hi | lo


def _unpack_int4(p: jnp.ndarray) -> jnp.ndarray:
    """[..., D//2] packed -> [..., D] int8 in [-7, 7] (sign-extended via
    arithmetic shifts; element order restored by the halves layout)."""
    lo = (p << jnp.int8(4)) >> jnp.int8(4)
    hi = p >> jnp.int8(4)
    return jnp.concatenate([lo, hi], axis=-1)


def flush_staging(cache: KVCache, K: int, config: ModelConfig) -> KVCache:
    """Commit a decode block's staged K/V (``sk``/``sv``,
    [L, B, H, K, Dh]) into the main cache at each row's pre-block
    cursor (``index - K``), then drop the staging buffers.

    The continuous server's staged block decode writes each step's K/V
    at a uniform scalar index (a cheap dynamic_update_slice); this ONE
    per-block scatter replaces ``sync_every`` per-step per-row scatters
    and, for quantized caches, quantizes once per block — from the
    ORIGINAL compute-dtype values, so the committed ints are
    byte-identical to the per-step path's (greedy server parity with
    ``generate`` holds through the staging round-trip)."""
    c = config
    if cache.sk is None:
        return cache
    start = cache.index - K                            # [B] pre-block cursors
    B = cache.k.shape[1]
    b_ix = jnp.arange(B)[:, None]                      # [B, 1]
    t_ix = start[:, None] + jnp.arange(K)[None, :]     # [B, K]
    ixs = (slice(None), b_ix, slice(None), t_ix)

    def _scatter(full, new):                           # new [L, B, H, K, Dm]
        # advanced indices [B, K] around the sliced L/H axes -> value
        # layout [B, K, L, H, Dm]; junk rows past capacity drop
        val = new.transpose(1, 3, 0, 2, 4).astype(full.dtype)
        Dm = full.shape[-1]
        if full.dtype == jnp.int8 and Dm % 4 == 0:
            # int8 scatters compile pathologically on v5e (see _write);
            # pack 4 lanes into int32, scatter, bitcast back
            shp = full.shape
            f32 = lax.bitcast_convert_type(
                full.reshape(*shp[:-1], Dm // 4, 4), jnp.int32)
            n32 = lax.bitcast_convert_type(
                val.reshape(*val.shape[:-1], Dm // 4, 4), jnp.int32)
            f32 = f32.at[(*ixs, slice(None))].set(n32, mode="drop")
            return lax.bitcast_convert_type(f32, jnp.int8).reshape(shp)
        return full.at[ixs].set(val, mode="drop")

    if cache.k_scale is not None:
        bits = 4 if c.kv_cache_dtype == "int4" else 8
        kq, ksc = _quantize_kv(cache.sk, bits)
        vq, vsc = _quantize_kv(cache.sv, bits)
        return cache._replace(
            k=_scatter(cache.k, kq), v=_scatter(cache.v, vq),
            k_scale=_scatter(cache.k_scale, ksc),
            v_scale=_scatter(cache.v_scale, vsc),
            sk=None, sv=None)
    return cache._replace(k=_scatter(cache.k, cache.sk),
                          v=_scatter(cache.v, cache.sv),
                          sk=None, sv=None)


# ---------------------------------------------------------------------------
# Transformer forward
# ---------------------------------------------------------------------------


def lm_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """lm_head tied to wte (src/model.py:600): [B, L, D] hidden ->
    [B, L, V] f32 logits, handling the int8-quantized serving embedding.
    Callers that need only SOME positions should slice/gather hidden
    first — the [B, L, V] f32 product is the single largest tensor a
    full-sequence call materializes (6.6 GB at B=256, L=128, V=50k)."""
    wte_p = params["wte"]
    if "embedding_q" in wte_p:  # int8 serving: scale on the logit axis
        return jnp.einsum(
            "bld,vd->blv", hidden, wte_p["embedding_q"].astype(hidden.dtype),
            preferred_element_type=jnp.float32, precision="highest",
        ) * wte_p["embedding_scale"][:, 0].astype(jnp.float32)
    return jnp.einsum(
        "bld,vd->blv", hidden, wte_p["embedding"].astype(hidden.dtype),
        preferred_element_type=jnp.float32, precision="highest")


class ModelOutput(NamedTuple):
    logits: Optional[jnp.ndarray]  # [B, L, V]; None when compute_logits=False
    emotion_logits: jnp.ndarray  # [B, num_emotions]
    hidden: jnp.ndarray  # [B, L, D] final hidden states
    loss: Optional[jnp.ndarray] = None
    lm_loss: Optional[jnp.ndarray] = None
    emotion_loss: Optional[jnp.ndarray] = None
    cache: Optional[KVCache] = None


def _qkv_heads(h, p, config):
    """Project h -> per-head (q, k, v)."""
    qkv = dense(h, p["c_attn"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (_split_heads(q, config.n_head), _split_heads(k, config.n_head),
            _split_heads(v, config.n_head))


def _attn_scale(config, li):
    scale = (1.0 / config.head_dim ** 0.5) if config.scale_attn_weights else 1.0
    if config.scale_attn_by_inverse_layer_idx:
        # reference: src/model.py:127-128
        scale = scale / (li + 1.0)
    return scale


def _attn_project(out, p, config, deterministic, rng):
    out = _merge_heads(out)
    out = dense(out, p["c_proj"])
    return _dropout(out, config.resid_pdrop, deterministic,
                    None if rng is None else jax.random.fold_in(rng, 2))


def _self_attention(h, p, li, *, config, attn_mask, deterministic, rng):
    """Training/no-cache self-attention sublayer. Returns (out, (k, v))."""
    c = config
    L = h.shape[1]
    q, k, v = _qkv_heads(h, p, c)
    kv_mask = None if attn_mask is None else attn_mask[:, :L]
    out = multihead_attention(
        q, k, v, causal=True, kv_mask=kv_mask, q_mask=kv_mask,
        scale=_attn_scale(c, li), impl=c.attention_impl,
        dropout_rate=c.attn_pdrop, deterministic=deterministic,
        rng=None if rng is None else jax.random.fold_in(rng, 1),
    )
    return _attn_project(out, p, c, deterministic, rng), (k, v)


def _self_attention_cached(h, p, li, li_int, k_full, v_full, ks_full, vs_full,
                           *, config, attn_mask, cache_index, deterministic,
                           rng, prefix_prefill: bool = False,
                           sk_full=None, sv_full=None, stage_index=None):
    """Decode self-attention over the carried full cache.

    Writes ONLY the new tokens' K/V into the (li, :, :, index:index+L, :)
    window — a [B, H, L, D] write, not a full-slice rewrite (profiling
    showed the full-slice update+writeback costing a 50MB store per
    layer-step) — then reads the layer slice once for attention. With an
    int8 cache (ks_full/vs_full scales present) new tokens quantize on
    write and the slice dequantizes on read.

    With a VECTOR ``cache_index`` ([B] per-row cursors) each row's K/V
    is written at its own position via one scatter (out-of-range
    cursors drop — finished serving slots write nowhere), and causality
    is enforced purely by the per-row tail mask ``kpos <= index[b]`` —
    physical position == logical position, no shared-cursor junk
    window. ``L > 1`` under per-row cursors is the speculative VERIFY
    step (the server's prompt-lookup drafting): row b's window of L new
    tokens is written at [index[b], index[b] + L) and query j may see
    keys at kpos <= index[b] + j (a per-row shifted causal bias — the
    caller rolls the cursor back to the accepted prefix afterwards).
    Returns (out, k_full, v_full, ks_full, vs_full)."""
    c = config
    L = h.shape[1]
    q, k, v = _qkv_heads(h, p, c)
    vec = cache_index.ndim == 1 if hasattr(cache_index, "ndim") else False
    if sk_full is not None and vec and L == 1:
        # STAGED block decode (server): write this step's K/V into the
        # staging buffer at the uniform scalar ``stage_index`` (a cheap
        # dynamic_update_slice — no per-row scatter), attend over the
        # main cache's flushed prefixes + the staging tail. The server
        # flushes staging into the main cache once per block.
        #
        # PERF NOTE (measured, round 4): attention here is
        # SPLIT-SOFTMAX — the first cut concatenated K/V and
        # materialized a whole-cache copy per layer-step (74.4 vs 95.8
        # utt/s offline bf16 S=64); splitting lifted int8 65.7 -> 73.6
        # utt/s. Even so, bf16 staging loses to the per-step scatter
        # (83.7 vs 95.8, ERGM_SERVER_STAGED=1 A/B), so the server
        # gates staging to QUANTIZED caches, where the alternative was
        # an ~80x pathological int8 scatter rather than a 1.16 ms one.
        dt_ = c.compute_dtype
        idx5 = (li_int, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                stage_index, jnp.zeros((), jnp.int32))
        sk_full = lax.dynamic_update_slice(sk_full, k.astype(sk_full.dtype)[None], idx5)
        sv_full = lax.dynamic_update_slice(sv_full, v.astype(sv_full.dtype)[None], idx5)
        Tm = k_full.shape[-2]
        B_ = k.shape[0]
        kpos_m = jax.lax.broadcasted_iota(jnp.int32, (1, Tm), 1)
        # main holds [0, index[b] - j): logical length minus unflushed
        main_mask = (kpos_m < (cache_index - stage_index)[:, None]).astype(jnp.float32)
        Ks = sk_full.shape[-2]
        spos = jax.lax.broadcasted_iota(jnp.int32, (1, Ks), 1)
        stage_mask = jnp.broadcast_to((spos <= stage_index).astype(jnp.float32),
                                      (B_, Ks))
        k_main = lax.dynamic_index_in_dim(k_full, li_int, 0, keepdims=False)
        v_main = lax.dynamic_index_in_dim(v_full, li_int, 0, keepdims=False)
        if ks_full is not None:
            if c.kv_cache_dtype == "int4":
                k_main = _unpack_int4(k_main)
                v_main = _unpack_int4(v_main)
            k_main = (k_main.astype(dt_)
                      * lax.dynamic_index_in_dim(ks_full, li_int, 0, keepdims=False).astype(dt_))
            v_main = (v_main.astype(dt_)
                      * lax.dynamic_index_in_dim(vs_full, li_int, 0, keepdims=False).astype(dt_))
        sk_tail = lax.dynamic_index_in_dim(sk_full, li_int, 0, keepdims=False)
        sv_tail = lax.dynamic_index_in_dim(sv_full, li_int, 0, keepdims=False)
        if ks_full is not None:
            # byte-parity with generate's per-step-quantized cache:
            # within-block reads must see the same quantize->dequantize
            # roundtrip the flushed cache will hold (flush_staging
            # quantizes from the ORIGINAL values, so the committed ints
            # equal generate's; this makes the in-flight tail agree too)
            bits = 4 if c.kv_cache_dtype == "int4" else 8
            qk, qks = _quantize_kv(sk_tail, bits)
            qv, qvs = _quantize_kv(sv_tail, bits)
            if bits == 4:
                qk, qv = _unpack_int4(qk), _unpack_int4(qv)
            sk_tail = qk.astype(dt_) * qks.astype(dt_)
            sv_tail = qv.astype(dt_) * qvs.astype(dt_)
        # Split-softmax: score the main cache and the staging tail
        # separately and concat only the [B, H, 1, *] SCORE vectors
        # (tiny) — never a K/V (or dequantized-cache) copy. The
        # softmax input is identical to the concat-KV formulation, so
        # greedy parity holds; PV splits into two partial sums. The
        # first cut of this path concatenated K/V and measured 74.4 vs
        # 95.8 utt/s offline bf16 S=64 (whole-cache copy per
        # layer-step); this form reads both operands in place.
        sc = _attn_scale(c, li)
        lm = jnp.einsum("bhqd,bhtd->bhqt", q, k_main.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                        precision="highest") * sc
        ls = jnp.einsum("bhqd,bhtd->bhqt", q, sk_tail.astype(q.dtype),
                        preferred_element_type=jnp.float32,
                        precision="highest") * sc
        lm = lm + ((1.0 - jnp.broadcast_to(main_mask, (B_, Tm)))
                   * -1e9)[:, None, None, :]
        ls = ls + ((1.0 - stage_mask) * -1e9)[:, None, None, :]
        probs = jax.nn.softmax(jnp.concatenate([lm, ls], axis=-1), axis=-1)
        pv_dt = v_main.dtype
        out = (jnp.einsum("bhqt,bhtd->bhqd", probs[..., :Tm].astype(pv_dt),
                          v_main, precision="highest")
               + jnp.einsum("bhqt,bhtd->bhqd", probs[..., Tm:].astype(pv_dt),
                            sv_tail.astype(pv_dt), precision="highest"))
        return (_attn_project(out, p, c, deterministic, rng),
                k_full, v_full, ks_full, vs_full, sk_full, sv_full)
    if prefix_prefill and L > 1 and not vec:
        # Initial prompt prefill (caller guarantees cache_index == 0):
        # attend DIRECTLY over the freshly computed k/v — a square
        # causal problem the Pallas flash/block kernels take — instead
        # of writing the cache and attending over the dequantized
        # [B, H, L, T] buffer slice, which materializes the full f32
        # logit tensor over the UNFILLED tail too (4.8 GB at the B=256
        # bench shape; prefill measured 93 ms vs a ~37 ms flops bound
        # before this path). The cache still receives the quantized
        # write below; only the attention source changes (fresh bf16
        # k/v vs their quantize->dequantize round trip — strictly less
        # quantization error on the prompt tokens).
        B_ = k.shape[0]
        impl = c.attention_impl
        use_pf_kernel = (
            impl == "auto" and L <= 128 and B_ >= 64
            and prefill_attention.supported(B_, L, c, deterministic))
        if ks_full is not None:
            # NOTE (round-5 layout probe): with the attention kernel
            # routing, the f32 upcast feeding this quantize divide gets
            # a 2x100 MB/layer relayout copy; quantizing from the
            # merged-view [B, L, H, Dh] instead was tried and XLA
            # canonicalized the transposes straight back (identical
            # copy inventory) — the relayout is a layout-assignment
            # artifact, not a formulation choice.
            kv_bits4 = 4 if c.kv_cache_dtype == "int4" else 8
            kq, ksc = _quantize_kv(k, kv_bits4)
            vq, vsc = _quantize_kv(v, kv_bits4)
            idx5 = (li_int, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    cache_index, jnp.zeros((), jnp.int32))
            k_full = lax.dynamic_update_slice(k_full, kq[None].astype(k_full.dtype), idx5)
            v_full = lax.dynamic_update_slice(v_full, vq[None].astype(v_full.dtype), idx5)
            ks_full = lax.dynamic_update_slice(ks_full, ksc[None], idx5)
            vs_full = lax.dynamic_update_slice(vs_full, vsc[None], idx5)
        else:
            idx5 = (li_int, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    cache_index, jnp.zeros((), jnp.int32))
            k_full = lax.dynamic_update_slice(k_full, k[None].astype(k_full.dtype), idx5)
            v_full = lax.dynamic_update_slice(v_full, v[None].astype(v_full.dtype), idx5)
        m = None if attn_mask is None else attn_mask[:, :L]
        if use_pf_kernel:
            # Batched short-prompt prefill: the round-5 batched-rows
            # kernel (ops/prefill_attention.py) replaces BOTH prior
            # options — XLA (18.7 ms/12 layers at B=256/L=128: f32
            # [B,H,L,L] probs materialized through transposed batched-
            # GEMM layouts) and the (batch, head)-grid block kernel
            # (3072 tiny programs, per-program overhead) — at 4.36 ms
            # device time for the same 12 layers (device-trace A/B,
            # results/prefill_kernel_bench.jsonl). Merged-layout
            # operands also cancel the _split_heads/_merge_heads
            # transposes on this path.
            out_m = prefill_attention.prefill_mha(
                _merge_heads(q), _merge_heads(k), _merge_heads(v), m,
                n_head=c.n_head, scale=_attn_scale(c, li))
            proj = dense(out_m, p["c_proj"])
            proj = _dropout(proj, c.resid_pdrop, deterministic,
                            None if rng is None else jax.random.fold_in(rng, 2))
            return (proj, k_full, v_full, ks_full, vs_full, sk_full,
                    sv_full)
        if impl == "auto" and L <= 128 and B_ >= 64:
            # measured on v5e (results/prefill_probe.jsonl, B=256
            # L=128): the XLA fused attention beats the Pallas block
            # kernel by ~17 ms of a ~102 ms device prefill here — the
            # short sequence leaves the block kernel a single K block
            # (no pipelining) while the large batch is all the
            # parallelism XLA needs. (Kept as the fallback when the
            # batched-rows kernel's shape gate declines.)
            impl = "xla"
        out = multihead_attention(
            q, k, v, causal=True, kv_mask=m, q_mask=m,
            scale=_attn_scale(c, li), impl=impl,
        )
        return (_attn_project(out, p, c, deterministic, rng),
                k_full, v_full, ks_full, vs_full, sk_full, sv_full)
    zero = jnp.zeros((), jnp.int32)
    dt = c.compute_dtype
    T = k_full.shape[-2]
    B, H = k.shape[0], k.shape[1]
    scale = _attn_scale(c, li)
    # Mask the unwritten cache tail; combined with any caller key mask.
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    vec_bias = None
    if vec:
        if L == 1:
            tail = (kpos < (cache_index[:, None] + 1)).astype(jnp.float32)
        else:
            # verify window: query j of row b sees kpos <= index[b] + j
            # — a [B, 1, L, T] additive bias (XLA decode path)
            qoff = jnp.arange(L, dtype=jnp.int32)
            allowed = (kpos[None, :, :]
                       <= cache_index[:, None, None] + qoff[None, :, None])
            vec_bias = jnp.where(allowed, 0.0, -1e9)[:, None, :, :]
            tail = jnp.ones((1, T), jnp.float32)  # bias carries the mask
        b_ix = jnp.arange(B)

        def _write(full, new):  # new [B, H, L, Dm] at (li, b, :, idx[b]+j, :)
            # 1D advanced indices around the sliced H axis: measured
            # 2.2x cheaper than the equivalent 2D [B, H] scatter on v5e
            # (1.16 vs 2.54 ms per 12-layer step at S=64, T=256), within
            # 15% of a scalar dynamic_update_slice
            Dm = full.shape[-1]
            if L == 1:
                row = new[:, :, 0, :].astype(full.dtype)  # [B, H, Dm]
                ixs = (li_int, b_ix, slice(None), cache_index)
            else:
                row = new.transpose(0, 2, 1, 3).astype(full.dtype)  # [B,L,H,Dm]
                t_ix = cache_index[:, None] + jnp.arange(L)[None, :]
                ixs = (li_int, b_ix[:, None], slice(None), t_ix)
            if full.dtype == jnp.int8 and Dm % 4 == 0:
                # an int8 scatter compiles PATHOLOGICALLY on v5e (315 s
                # for this one op vs 0.5 s for the f32 twin); pack 4
                # int8 lanes into int32, scatter, bitcast back (1.2 s
                # compile, byte-identical)
                shp = full.shape
                f32 = lax.bitcast_convert_type(
                    full.reshape(*shp[:-1], Dm // 4, 4), jnp.int32)
                n32 = lax.bitcast_convert_type(
                    row.reshape(*row.shape[:-1], Dm // 4, 4), jnp.int32)
                f32 = f32.at[(*ixs, slice(None))].set(n32, mode="drop")
                return lax.bitcast_convert_type(f32, jnp.int8).reshape(shp)
            return full.at[(*ixs, slice(None))].set(row, mode="drop")
    else:
        tail = (kpos < (cache_index + L)).astype(jnp.float32)
        idx5 = (li_int, zero, zero, cache_index, zero)

        def _write(full, new):
            return lax.dynamic_update_slice(full, new[None].astype(full.dtype),
                                            idx5)
    kv_mask = tail if attn_mask is None else attn_mask[:, :T] * tail

    if ks_full is not None:
        kv_bits = 4 if c.kv_cache_dtype == "int4" else 8
        kq, ksc = _quantize_kv(k, kv_bits)
        vq, vsc = _quantize_kv(v, kv_bits)
        k_full = _write(k_full, kq)
        v_full = _write(v_full, vq)
        ks_full = _write(ks_full, ksc)
        vs_full = _write(vs_full, vsc)
        if L == 1 and T >= 512 and not vec:
            # Scale-factored int8 attention: the per-(token, head) scales
            # factor OUT of both dots, so the einsums read the RAW int8
            # cache (a plain convert fuses into the dot's operand read;
            # dequantize-then-attend materializes a bf16 copy of the
            # whole cache per layer-step). Measured on v5e decode:
            # T=1024 B=64: 6178 tok/s factored vs 4243 dequantized vs
            # 5777 bf16-cache; T=512 B=128: 26.9k factored vs 23.9k
            # bf16. At SHORT caches the dequantized copy is cheap and
            # XLA's fused attention wins (T=256 B=256: 58.8k vs 54.8k
            # factored), hence the T >= 512 gate.
            kq_all = lax.dynamic_index_in_dim(k_full, li_int, 0, keepdims=False)
            ks_all = lax.dynamic_index_in_dim(ks_full, li_int, 0, keepdims=False)
            vq_all = lax.dynamic_index_in_dim(v_full, li_int, 0, keepdims=False)
            vs_all = lax.dynamic_index_in_dim(vs_full, li_int, 0, keepdims=False)
            if kv_bits == 4:
                kq_all = _unpack_int4(kq_all)
                vq_all = _unpack_int4(vq_all)
            s = jnp.einsum("bhqd,bhtd->bhqt", q.astype(dt), kq_all.astype(dt),
                           preferred_element_type=jnp.float32,
                           precision="highest") * scale
            s = s * ks_all[..., 0].astype(jnp.float32)[:, :, None, :]
            s = s + (1.0 - kv_mask).astype(jnp.float32)[:, None, None, :] * -1e9
            probs = jax.nn.softmax(s, axis=-1)
            pv = (probs * vs_all[..., 0].astype(jnp.float32)[:, :, None, :]).astype(dt)
            out = jnp.einsum("bhqt,bhtd->bhqd", pv, vq_all.astype(dt),
                             precision="highest")
            return (_attn_project(out, p, c, deterministic, rng),
                    k_full, v_full, ks_full, vs_full, sk_full, sv_full)
        # multi-token (prefill) / short-cache path with a quantized
        # cache: dequantize the slice (the convert + multiply fuse into
        # the attention operand read; int4 adds an unpack that fuses the
        # same way)
        kq_all = lax.dynamic_index_in_dim(k_full, li_int, 0, keepdims=False)
        vq_all = lax.dynamic_index_in_dim(v_full, li_int, 0, keepdims=False)
        if kv_bits == 4:
            kq_all = _unpack_int4(kq_all)
            vq_all = _unpack_int4(vq_all)
        k_all = (kq_all.astype(dt)
                 * lax.dynamic_index_in_dim(ks_full, li_int, 0, keepdims=False).astype(dt))
        v_all = (vq_all.astype(dt)
                 * lax.dynamic_index_in_dim(vs_full, li_int, 0, keepdims=False).astype(dt))
    else:
        k_full = _write(k_full, k)
        v_full = _write(v_full, v)
        k_all = lax.dynamic_index_in_dim(k_full, li_int, 0, keepdims=False)
        v_all = lax.dynamic_index_in_dim(v_full, li_int, 0, keepdims=False)
        # Decode-attention perf note (profiled on v5e, round 3): the
        # slice+dot pair compiles to VPU loop fusions at ~196 (QK) /
        # ~284 (PV) GB/s — the D=64 minor dim makes every cache read a
        # half-tile, and an Lq=1 matvec is never routed to the MXU.
        # Measured alternatives, all WORSE at S=64/T=384 (baseline
        # 5.0 ms/step): optimization_barrier to split copy+fast-dot
        # 10.2; broadcast q to 8 rows for MXU eligibility 7.7 (f32
        # softmax chain x8 on the VPU); decode_scan_unroll=12 to make
        # the layer index static 5.8. A bespoke Pallas decode kernel is
        # blocked by per-pallas_call overhead on this runtime (a
        # trivial kernel costs ~0.25-2.6 ms/call; 12 layer calls exceed
        # the whole XLA step), and the library paged kernels reject
        # H=12/D=64 geometry (results/decode_ablation.jsonl).

    # Single-token decode attention runs on XLA's fused path. A bespoke
    # block-skipping Pallas decode kernel (clamped BlockSpec index maps so
    # dead cache blocks issue no DMA) was built and measured on v5e at
    # B=128/H=12/T=1024: 1336-1986 us/op vs XLA's flat ~1190 us at every
    # live length — at GPT-2 head counts the [H, block_k] per-block matmul
    # fills 12 of 128 MXU rows and per-grid-step overhead dominates, so
    # the kernel lost everywhere and was removed (VERDICT r1 item 8;
    # measurements in results/decode_kernel_bench.jsonl, git history has
    # the kernel).
    out = multihead_attention(
        q, k_all, v_all, causal=not vec, kv_mask=kv_mask,
        q_mask=None if attn_mask is None else attn_mask[:, :L],
        extra_bias=vec_bias if vec else None,
        scale=scale, causal_offset=0 if vec else cache_index,
        impl=c.attention_impl,
    )
    return (_attn_project(out, p, c, deterministic, rng),
            k_full, v_full, ks_full, vs_full, sk_full, sv_full)


def _capless_row_gate(out, enc_mask):
    """Zero the cross-attn residual for rows whose caption mask is all
    zero (ragged batches mix captioned and caption-less samples): with
    every key masked to -1e9 the softmax would go UNIFORM over pad
    embeddings and inject junk into the caption-less row instead of
    being a no-op."""
    if enc_mask is None:
        return out
    has = (jnp.sum(enc_mask.astype(jnp.float32), axis=-1) > 0)
    return out * has[:, None, None].astype(out.dtype)


def _cross_attention(h, enc, p, li, *, config, enc_mask, cached_kv,
                     deterministic, rng, prefill_kernel_ok: bool = False):
    """Cross-attention: Q from hidden states, K/V from encoder states via a
    shared c_attn (reference: src/model.py:211-226). Non-causal;
    ``enc_mask`` is the raw [B, Lc] caption mask. Rows with an all-zero
    mask contribute a ZERO residual (see _capless_row_gate).

    ``cached_kv`` (decode) arrives in the cache's merged-head layout
    [B, Lc, H*Dh] and is consumed in [B, Lc, H, Dh] form directly by the
    attention einsums — a pure bitcast, no per-step transpose back to
    [B, H, Lc, Dh]."""
    c = config
    if cached_kv is not None and h.shape[1] == 1:
        # Lane-grouped single-token decode: the cross cache [B, Lc, H*Dh]
        # is read at full 768-lane rows and reduced WITHIN the minor dim
        # (768 -> [H, Dh] is a layout-preserving split). The einsum
        # formulation ("bhqd,bkhd->bhqk") batches over non-adjacent
        # dims, so XLA materializes a [B, H, Lc, Dh] transpose of the
        # whole cache every layer-step — measured 0.89 ms of the 4.44 ms
        # B=256 decode step vs a 0.37 ms read bound
        # (results/decode_roofline.jsonl); this path removes the
        # transpose: multiply-by-broadcast + grouped lane reduction.
        B = h.shape[0]
        H, Dh = c.n_head, c.head_dim
        qf = dense(h, p["q_attn"])[:, 0, :]            # [B, H*Dh] merged
        ck, cv = cached_kv[0], cached_kv[1]            # [B, Lc, H*Dh]
        Lc = ck.shape[1]
        scale = (1.0 / Dh ** 0.5) if c.scale_attn_weights else 1.0
        if c.scale_attn_by_inverse_layer_idx:
            scale = scale / (li + 1.0)
        # f32 products (the convert fuses into the cache read; matches
        # the einsum path's precision="highest" accumulate for the
        # <=1e-3 parity bar)
        prod = ck.astype(jnp.float32) * qf.astype(jnp.float32)[:, None, :]
        s = prod.reshape(B, Lc, H, Dh).sum(-1) * scale
        if len(cached_kv) == 4:
            # int8 cross cache: per-(token, head) scales factor OUT of
            # both reductions (the raw int8 cache feeds the multiply;
            # measured 0.32 vs 0.51 ms/step bf16, results/int4_kv_probe
            # .jsonl)
            s = s * cached_kv[2].astype(jnp.float32)
        if enc_mask is not None:
            s = s + (1.0 - enc_mask.astype(jnp.float32))[:, :, None] * -1e9
        pr = jax.nn.softmax(s, axis=1)                 # over Lc
        if len(cached_kv) == 4:
            pr = pr * cached_kv[3].astype(jnp.float32)
        w = jnp.broadcast_to(pr[:, :, :, None], (B, Lc, H, Dh))
        w = w.reshape(B, Lc, H * Dh)
        out = (cv.astype(jnp.float32) * w).sum(axis=1)  # [B, H*Dh] merged
        out = out.astype(h.dtype)[:, None, :]
        out = dense(out, p["c_proj"])
        out = _capless_row_gate(out, enc_mask)
        return _dropout(out, c.resid_pdrop, deterministic,
                        None if rng is None else jax.random.fold_in(rng, 4)), cached_kv
    q = _split_heads(dense(h, p["q_attn"]), c.n_head)  # [B, H, Lq, Dh]
    if cached_kv is not None:
        B = q.shape[0]
        k_r = cached_kv[0].reshape(B, -1, c.n_head, c.head_dim)  # [B, Lc, H, Dh]
        v_r = cached_kv[1].reshape(B, -1, c.n_head, c.head_dim)
        if len(cached_kv) == 4:
            # int8 cross cache on the multi-token (spec verify) path:
            # dequantize the slice with the per-(token, head) scales
            dt = h.dtype
            k_r = k_r.astype(dt) * cached_kv[2].astype(dt)[..., None]
            v_r = v_r.astype(dt) * cached_kv[3].astype(dt)[..., None]
        scale = (1.0 / c.head_dim ** 0.5) if c.scale_attn_weights else 1.0
        if c.scale_attn_by_inverse_layer_idx:
            scale = scale / (li + 1.0)
        logits = jnp.einsum("bhqd,bkhd->bhqk", q, k_r,
                            preferred_element_type=jnp.float32,
                            precision="highest") * scale
        if enc_mask is not None:
            logits = logits + (1.0 - enc_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bhqd", probs.astype(v_r.dtype), v_r,
                         precision="highest")
        out = _merge_heads(out)
        out = dense(out, p["c_proj"])
        out = _capless_row_gate(out, enc_mask)
        return _dropout(out, c.resid_pdrop, deterministic,
                        None if rng is None else jax.random.fold_in(rng, 4)), cached_kv
    kv = dense(enc, p["c_attn"])
    k, v = jnp.split(kv, 2, axis=-1)
    km, vm = k, v                           # merged [B, Lc, H*Dh]
    k = _split_heads(k, c.n_head)
    v = _split_heads(v, c.n_head)
    scale = (1.0 / c.head_dim ** 0.5) if c.scale_attn_weights else 1.0
    if c.scale_attn_by_inverse_layer_idx:
        scale = scale / (li + 1.0)
    B_, Lq, Lc_ = h.shape[0], h.shape[1], km.shape[1]
    if (prefill_kernel_ok and c.attention_impl == "auto"
            and B_ >= 64 and Lc_ % 8 == 0
            and (deterministic or c.attn_pdrop == 0)
            and _os.environ.get("ERGM_XPREFILL_KERNEL", "1")
            not in ("0", "false")
            and prefill_attention.supported(B_, Lq, c, True)):
        # cross PREFILL attention on the batched-rows kernel
        # (rectangular non-causal form): kills the f32
        # [B, H, Lq, Lc] probs materialization and the head
        # split/merge transposes on this path (decode-side prefill
        # only — the kernel has no VJP, so training keeps XLA)
        out = prefill_attention.prefill_mha(
            _merge_heads(q), km, vm, enc_mask, n_head=c.n_head,
            scale=scale, causal=False)
    else:
        out = multihead_attention(
            q, k, v, causal=False, kv_mask=enc_mask, scale=scale,
            impl=c.attention_impl,
            dropout_rate=c.attn_pdrop, deterministic=deterministic,
            rng=None if rng is None else jax.random.fold_in(rng, 3),
        )
        out = _merge_heads(out)
    out = dense(out, p["c_proj"])
    out = _capless_row_gate(out, enc_mask)
    out = _dropout(out, c.resid_pdrop, deterministic,
                   None if rng is None else jax.random.fold_in(rng, 4))
    return out, (k, v)


def _mlp(h, p, *, config, deterministic, rng):
    act = _activation(config.activation)
    h = dense(h, p["c_fc"])
    h = act(h)
    h = dense(h, p["c_proj"])
    return _dropout(h, config.resid_pdrop, deterministic,
                    None if rng is None else jax.random.fold_in(rng, 5))


def transformer(
    params: Params,
    config: ModelConfig,
    input_ids: jnp.ndarray,  # [B, L]
    *,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,  # [B, Lk] 0/1 over keys
    imgs: Optional[jnp.ndarray] = None,  # [B, modality_dim]
    auds: Optional[jnp.ndarray] = None,  # [B, modality_dim]
    caption_ids: Optional[jnp.ndarray] = None,  # [B, Lc]
    encoder_hidden_states: Optional[jnp.ndarray] = None,  # [B, Lc, D]
    encoder_attention_mask: Optional[jnp.ndarray] = None,  # [B, Lc] 0/1
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    prefix_prefill: bool = False,  # static: cache_index is known 0 (initial prompt)
    stage_index=None,  # scalar step-in-block index (staged server decode)
):
    """GPT2Model.forward equivalent (reference: src/model.py:420-596).

    Returns (hidden [B, L, D], new_cache_or_None).
    """
    c = config
    dtype = c.compute_dtype
    B, L = input_ids.shape

    past_len = cache.index if cache is not None else 0
    if position_ids is None:
        base = (past_len[:, None]
                if getattr(past_len, "ndim", 0) == 1 else past_len)
        position_ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

    h = embed_rows(params["wte"], input_ids, dtype)

    # Caption conditioning through the shared wte (src/model.py:460-463).
    if caption_ids is not None and encoder_hidden_states is None and c.use_cross_attention:
        encoder_hidden_states = embed_rows(params["wte"], caption_ids, dtype)
    use_cross = c.use_cross_attention and (
        encoder_hidden_states is not None or (cache is not None and cache.ck is not None)
    )

    # Multimodal injection at the first two REAL positions — slots 0/1 of
    # the logical sequence (src/model.py:495-498) — with projection on dim
    # mismatch (fixes SURVEY.md §2.4.12). With a left-padded attention
    # mask the first real position differs per row, so inject via one-hot
    # scatters derived from the mask.
    if imgs is not None or auds is not None:
        if attention_mask is not None:
            m = attention_mask[:, :L].astype(dtype)
            csum = jnp.cumsum(m, axis=-1)
            slot0 = ((csum == 1) & (m > 0)).astype(dtype)
            slot1 = ((csum == 2) & (m > 0)).astype(dtype)
        else:
            slot0 = slot1 = None
    if imgs is not None:
        img_f = imgs.astype(dtype)
        if "img_proj" in params:
            img_f = dense(img_f, params["img_proj"])
        h = h + slot0[..., None] * img_f[:, None, :] if slot0 is not None \
            else h.at[:, 0, :].add(img_f)
    if auds is not None:
        aud_f = auds.astype(dtype)
        if "aud_proj" in params:
            aud_f = dense(aud_f, params["aud_proj"])
        h = h + slot1[..., None] * aud_f[:, None, :] if slot1 is not None \
            else h.at[:, 1, :].add(aud_f)

    h = h + jnp.take(params["wpe"]["embedding"], position_ids, axis=0).astype(dtype)
    if token_type_ids is not None:
        # Token types embed through wte (src/model.py:502-504).
        h = h + embed_rows(params["wte"], token_type_ids, dtype)
    h = _dropout(h, c.embd_pdrop, deterministic,
                 None if rng is None else jax.random.fold_in(rng, 0))

    enc_mask = encoder_attention_mask if use_cross else None
    enc = encoder_hidden_states
    decode = cache is not None

    # remat_policy="mlp": checkpoint ONLY the MLP / cross-attention
    # sublayers. Self-attention keeps its VJP residuals (incl. the flash
    # kernel's saved softmax stats), so backward never re-runs the flash
    # forward — measured the single largest recompute cost of full-block
    # remat — while the big [B, L, 4D] MLP intermediates are still freed.
    # "mlp_only" additionally keeps cross-attention residuals (more
    # memory, less recompute).
    mlp_remat = (c.remat and c.remat_policy in ("mlp", "mlp_only")
                 and not decode)

    def _mlp_sub(mlp_in, pm, layer_rng):
        return _mlp(mlp_in, pm, config=c, deterministic=deterministic,
                    rng=layer_rng)

    def _cross_sub(ca_in, enc_, pc, li, layer_rng):
        return _cross_attention(ca_in, enc_, pc, li, config=c,
                                enc_mask=enc_mask, cached_kv=None,
                                deterministic=deterministic,
                                rng=layer_rng)[0]

    if mlp_remat:
        _mlp_sub = jax.checkpoint(_mlp_sub, prevent_cse=False)
        if c.remat_policy == "mlp":
            _cross_sub = jax.checkpoint(_cross_sub, prevent_cse=False)

    # fused cross-decode kernel (ops/cross_decode.py): decide ONCE per
    # trace and prepare the stacked kernel operands OUTSIDE the layer
    # scan — per-layer operand prep inside the scan body measurably
    # costs more than the kernel saves (round-5 A/B, results/
    # cross_kernel_bench.jsonl)
    cross_kp = cross_mask = None
    if (decode and use_cross and enc is None
            and cache.ck_scale is not None
            and cross_decode.supported(
                h, params["blocks"],
                (cache.ck, cache.cv, cache.ck_scale, cache.cv_scale), c,
                deterministic)):
        cross_kp = cross_decode.prep_params(params["blocks"], c, h.dtype)
        cross_mask = (jnp.ones((h.shape[0], cache.ck.shape[2]), jnp.float32)
                      if enc_mask is None else enc_mask.astype(jnp.float32))

    def block(carry, xs):
        # decode carries the FULL stacked cache: new-token K/V are written
        # into it with a tiny [B, H, L, D] store and the layer slice is
        # read once for attention (XLA aliases the carry buffer, so the
        # cache is genuinely updated in place across layers and steps).
        if decode:
            (h, k_full, v_full, ks_full, vs_full, ck_full, cv_full,
             cks_full, cvs_full, sk_full, sv_full) = carry
            p, li = xs
            li_int = li.astype(jnp.int32)
            # fused cross sublayer (ops/cross_decode.py): single-token
            # steps over the QUANTIZED cross cache run ln_cross + q_attn
            # + grouped attention + c_proj + gate + residual as ONE
            # Pallas launch per layer, reading the stacked cache AND
            # stacked params in place via scalar-prefetch indexing — no
            # per-layer slice or operand prep runs in the scan body, so
            # the slicing below is skipped too.
            fuse_cross = cross_kp is not None
            if ck_full is not None and enc is None and not fuse_cross:
                ckv = (lax.dynamic_index_in_dim(ck_full, li_int, 0, keepdims=False),
                       lax.dynamic_index_in_dim(cv_full, li_int, 0, keepdims=False))
                if cks_full is not None:
                    # [..., :H]: drop the lane-tile padding of the scale
                    # buffers (see init_kv_cache) for the XLA read path
                    ckv += (lax.dynamic_index_in_dim(
                                cks_full, li_int, 0,
                                keepdims=False)[..., :c.n_head],
                            lax.dynamic_index_in_dim(
                                cvs_full, li_int, 0,
                                keepdims=False)[..., :c.n_head])
            else:
                ckv = None
        else:
            h = carry
            p, li = xs
            ckv = None
        layer_rng = None if rng is None else jax.random.fold_in(rng, 1000 + li.astype(jnp.int32))

        # self-attention (pre-LN residual, src/model.py:297-309)
        attn_in = layer_norm(h, p["ln_1"], c.layer_norm_epsilon)
        if decode:
            (attn_out, k_full, v_full, ks_full, vs_full, sk_full,
             sv_full) = _self_attention_cached(
                attn_in, p["attn"], li, li_int, k_full, v_full, ks_full, vs_full,
                config=c, attn_mask=attention_mask, cache_index=past_len,
                deterministic=deterministic, rng=layer_rng,
                prefix_prefill=prefix_prefill,
                sk_full=sk_full, sv_full=sv_full, stage_index=stage_index,
            )
        else:
            attn_out, _ = _self_attention(
                attn_in, p["attn"], li, config=c, attn_mask=attention_mask,
                deterministic=deterministic, rng=layer_rng,
            )
        h = h + attn_out

        # optional cross-attention (src/model.py:311-329)
        new_ckv = None
        if use_cross and decode and fuse_cross:
            sc = (1.0 / c.head_dim ** 0.5) if c.scale_attn_weights else 1.0
            if c.scale_attn_by_inverse_layer_idx:
                sc = sc / (li.astype(jnp.float32) + 1.0)
            h = cross_decode.fused_cross_decode(
                h, cross_kp, li_int, sc,
                (ck_full, cv_full, cks_full, cvs_full), cross_mask, c)
        elif use_cross:
            ca_in = layer_norm(h, p["ln_cross"], c.layer_norm_epsilon)
            if mlp_remat:
                ca_out = _cross_sub(ca_in, enc, p["cross_attn"], li, layer_rng)
            else:
                ca_out, new_ckv = _cross_attention(
                    ca_in, enc, p["cross_attn"], li, config=c, enc_mask=enc_mask,
                    cached_kv=ckv, deterministic=deterministic, rng=layer_rng,
                    prefill_kernel_ok=decode,
                )
            h = h + ca_out

        # MLP (src/model.py:331-334); decode steps may fuse the whole
        # LN2+MLP+residual tail into one Pallas program (the trace-
        # measured diffuse trunk floor, ops/fused_decode.py) — math
        # mirrors the unfused composition, deterministic only (decode
        # never applies resid dropout anyway when deterministic)
        if (decode and c.decode_fused_mlp and deterministic):
            from ergm_tpu.ops import fused_decode
            if fused_decode.supported(h, p["mlp"], c):
                h = fused_decode.fused_ln_mlp(h, p["ln_2"], p["mlp"], c)
            else:
                mlp_in = layer_norm(h, p["ln_2"], c.layer_norm_epsilon)
                h = h + _mlp_sub(mlp_in, p["mlp"], layer_rng)
        else:
            mlp_in = layer_norm(h, p["ln_2"], c.layer_norm_epsilon)
            h = h + _mlp_sub(mlp_in, p["mlp"], layer_rng)
        if decode:
            # store freshly computed cross K/V at prefill (skipped when the
            # values came from the cache, or no cross cache was allocated)
            if new_ckv is not None and enc is not None and ck_full is not None:
                def _merge_kv(x):  # [B, H, Lc, Dh] -> [B, Lc, H*Dh]
                    b, nh, lc, hd = x.shape
                    return x.transpose(0, 2, 1, 3).reshape(b, lc, nh * hd)

                mk, mv = _merge_kv(new_ckv[0]), _merge_kv(new_ckv[1])
                if cks_full is not None:
                    # int8 cross cache: quantize per (token, head) over
                    # the Dh groups of the merged minor dim
                    def _cquant(m):
                        b, lc, hd = m.shape
                        g = m.reshape(b, lc, c.n_head, c.head_dim)
                        q, s = _quantize_kv(g)
                        s = s[..., 0]
                        pad = _cross_scale_pad(c) - c.n_head
                        if pad:  # lane-tile padding (see init_kv_cache)
                            s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)))
                        return q.reshape(b, lc, hd), s
                    mk, sk = _cquant(mk)
                    mv, sv = _cquant(mv)
                    cks_full = lax.dynamic_update_index_in_dim(
                        cks_full, sk.astype(cks_full.dtype), li_int, 0)
                    cvs_full = lax.dynamic_update_index_in_dim(
                        cvs_full, sv.astype(cvs_full.dtype), li_int, 0)
                ck_full = lax.dynamic_update_index_in_dim(
                    ck_full, mk.astype(ck_full.dtype), li_int, 0)
                cv_full = lax.dynamic_update_index_in_dim(
                    cv_full, mv.astype(cv_full.dtype), li_int, 0)
            return (h, k_full, v_full, ks_full, vs_full, ck_full, cv_full,
                    cks_full, cvs_full, sk_full, sv_full), None
        return h, None

    block_fn = block
    if c.remat and not mlp_remat:
        # trade FLOPs for HBM like torch.utils.checkpoint (src/model.py:535-551).
        # "full" recomputes the entire block (round-1 behavior); "dots"
        # saves matmul outputs and replays only elementwise/softmax work
        # (measured SLOWER than full at B=64: the saves spill); "mlp"
        # (handled above) is the measured-best policy.
        if c.remat_policy == "dots":
            policy = jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
            block_fn = jax.checkpoint(block_fn, prevent_cse=False, policy=policy)
        else:
            block_fn = jax.checkpoint(block_fn, prevent_cse=False)

    layer_ids = jnp.arange(c.n_layer, dtype=jnp.float32)
    blocks_p = dict(params["blocks"])
    if not use_cross:
        blocks_p.pop("ln_cross", None)
        blocks_p.pop("cross_attn", None)
    elif "cross_attn" not in blocks_p:
        raise ValueError("cross-attention inputs given but model has no cross-attn params "
                         "(config.use_cross_attention=False)")

    xs = (blocks_p, layer_ids)
    if decode:
        carry = (h, cache.k, cache.v, cache.k_scale, cache.v_scale,
                 cache.ck, cache.cv, cache.ck_scale, cache.cv_scale,
                 cache.sk, cache.sv)
        # single-token decode steps may unroll the layer scan: the
        # per-token cost at small batch is latency-bound on ~70 tiny
        # matmuls, and unrolling lets XLA prefetch the next layer's
        # weights while the current one computes (scan carries serialize
        # that). Prefill (L>1) keeps the rolled scan: compute-bound.
        unroll = c.decode_scan_unroll if L == 1 else 1
        (h, new_k, new_v, new_ks, new_vs, new_ck, new_cv,
         new_cks, new_cvs, new_sk, new_sv), _ = \
            lax.scan(block_fn, carry, xs, unroll=max(unroll, 1))
        new_cache = KVCache(k=new_k, v=new_v, index=cache.index + L,
                            ck=new_ck, cv=new_cv,
                            k_scale=new_ks, v_scale=new_vs,
                            ck_scale=new_cks, cv_scale=new_cvs,
                            sk=new_sk, sv=new_sv)
    else:
        h, _ = lax.scan(block_fn, h, xs)
        new_cache = None

    h = layer_norm(h, params["ln_f"], c.layer_norm_epsilon)
    return h, new_cache


def chunked_lm_loss(hidden: jnp.ndarray, wte: jnp.ndarray, labels: jnp.ndarray,
                    ignore_index: int = -100, chunk: int = 128) -> jnp.ndarray:
    """Shifted LM cross-entropy without materializing [B, L, V] logits.

    The reference computes full logits then CE (src/model.py:698,
    705-708) — at B=32, L=512, V=50k the fp32 logits plus their
    cotangent alone exceed several GB of HBM. Here the sequence is
    processed in chunks under ``jax.checkpoint``: each chunk's logits
    exist only transiently in fwd and are recomputed in bwd, bounding
    live memory at O(B * chunk * V). Numerically identical (fp32
    logsumexp) to the dense path.
    """
    B, L, D = hidden.shape
    # next-token shift: position t is scored against labels[t+1]
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), ignore_index, labels.dtype)], axis=1)
    n = L // chunk
    rem = L - n * chunk
    main_h = hidden[:, :n * chunk].reshape(B, n, chunk, D).swapaxes(0, 1)
    main_l = shifted[:, :n * chunk].reshape(B, n, chunk).swapaxes(0, 1)

    def piece(h_c, l_c):
        logits = jnp.einsum("bcd,vd->bcv", h_c, wte.astype(h_c.dtype),
                            preferred_element_type=jnp.float32,
                            precision="highest")
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(
            logits, jnp.maximum(l_c, 0)[..., None], axis=-1)[..., 0]
        mask = (l_c != ignore_index).astype(jnp.float32)
        return jnp.sum((logz - gold) * mask), jnp.sum(mask)

    piece = jax.checkpoint(piece, prevent_cse=False)

    def scan_body(carry, xs):
        s, c = piece(*xs)
        return (carry[0] + s, carry[1] + c), None

    (tot, cnt), _ = lax.scan(scan_body, (jnp.zeros(()), jnp.zeros(())),
                             (main_h, main_l))
    if rem:
        s, c = piece(hidden[:, n * chunk:], shifted[:, n * chunk:])
        tot, cnt = tot + s, cnt + c
    return tot / jnp.maximum(cnt, 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Mean CE over non-ignored targets, matching torch CrossEntropyLoss
    (reference loss: src/model.py:703-713). fp32 throughout."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe_labels = jnp.maximum(labels, 0)
    gold = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = logz - gold
    if ignore_index is None:
        return jnp.mean(nll)
    mask = (labels != ignore_index).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom


def forward(
    params: Params,
    config: ModelConfig,
    input_ids: jnp.ndarray,
    *,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,  # [B, Lk] 0/1
    imgs: Optional[jnp.ndarray] = None,
    auds: Optional[jnp.ndarray] = None,
    caption_ids: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    emotion_labels: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    cache: Optional[KVCache] = None,
    prefix_prefill: bool = False,  # static: initial prompt prefill (cache.index==0)
    stage_index=None,  # scalar step-in-block index (staged server decode)
    seq_lengths: Optional[jnp.ndarray] = None,
    compute_logits=True,  # True | False | "last" (final position only)
    mesh=None,  # jax.sharding.Mesh: enables the sharded fused LM loss
) -> ModelOutput:
    """GPT2LMHeadModel.forward equivalent (reference: src/model.py:654-737).

    ``labels`` use -100 as the ignore index; loss is the joint LM + emotion
    CE when both label kinds are given (src/model.py:704-713).

    ``seq_lengths`` [B]: when given, the emotion head reads each row's
    LAST REAL token (position len-1) instead of the literal final
    position (src/model.py:700 reads hidden[:, -1], which under padded
    batches is an eos pad — SURVEY.md §3.3; pass None for strict parity).
    """
    c = config
    hidden, new_cache = transformer(
        params, c, input_ids,
        token_type_ids=token_type_ids, position_ids=position_ids,
        attention_mask=attention_mask, imgs=imgs, auds=auds,
        caption_ids=caption_ids, encoder_hidden_states=encoder_hidden_states,
        encoder_attention_mask=encoder_attention_mask,
        deterministic=deterministic, rng=rng, cache=cache,
        prefix_prefill=prefix_prefill, stage_index=stage_index,
    )

    # lm_head tied to wte (src/model.py:600); fp32 logits for the loss path.
    # compute_logits=False (training) skips the dense [B, L, V] logits and
    # computes the LM loss chunked instead (see chunked_lm_loss).
    # compute_logits="last" computes them for the FINAL position only —
    # the decode-prefill case, where the full-sequence [B, L, V] f32
    # logits (6.6 GB at B=256, L=128) would be materialized just to
    # sample one token per row.
    wte_p = params["wte"]
    logits = None
    if compute_logits:
        lm_in = hidden[:, -1:, :] if compute_logits == "last" else hidden
        logits = lm_logits(params, lm_in)
    # emotion head on the final hidden state (src/model.py:700-701)
    if seq_lengths is not None:
        idx = jnp.clip(seq_lengths.astype(jnp.int32) - 1, 0, hidden.shape[1] - 1)
        last_hidden = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    else:
        last_hidden = hidden[:, -1, :]
    emotion_logits = jnp.dot(last_hidden,
                             params["emotion_head"]["kernel"].astype(hidden.dtype),
                             preferred_element_type=jnp.float32, precision="highest")

    loss = lm_loss = emo_loss = None
    if labels is not None:
        if compute_logits == "last":
            raise ValueError("compute_logits='last' cannot serve an LM loss "
                             "(labels given); use True or False")
        if logits is not None:
            lm_loss = cross_entropy(logits[:, :-1, :], labels[:, 1:], ignore_index=-100)
        else:
            # pure-DP meshes run the kernel per shard via shard_map (an
            # opaque pallas_call under plain pjit would make the
            # partitioner replicate its operands); TP meshes keep the
            # chunked path, which XLA shards correctly
            pure_dp = mesh is not None and not any(
                a != "data" and mesh.shape[a] > 1 for a in mesh.axis_names)
            use_fused = c.lm_loss_impl == "fused" or (
                c.lm_loss_impl == "auto" and jax.default_backend() == "tpu"
                and (jax.device_count() == 1 or pure_dp))
            if use_fused and mesh is not None and pure_dp \
                    and "data" in mesh.axis_names:
                from ergm_tpu.ops.fused_ce import fused_lm_loss_sharded

                lm_loss = fused_lm_loss_sharded(
                    hidden, wte_dense(wte_p, hidden.dtype), labels, mesh,
                    interpret=jax.default_backend() != "tpu")
            elif use_fused:
                from ergm_tpu.ops.fused_ce import fused_lm_loss

                lm_loss = fused_lm_loss(hidden, wte_dense(wte_p, hidden.dtype),
                                        labels,
                                        interpret=jax.default_backend() != "tpu")
            else:
                lm_loss = chunked_lm_loss(hidden, wte_dense(wte_p, hidden.dtype),
                                          labels, chunk=c.loss_chunk)
    if emotion_labels is not None:
        emo_loss = cross_entropy(emotion_logits, emotion_labels)
    if lm_loss is not None and emo_loss is not None:
        loss = lm_loss + emo_loss  # src/model.py:713
    elif lm_loss is not None:
        loss = lm_loss
    elif emo_loss is not None:
        loss = emo_loss

    return ModelOutput(logits=logits, emotion_logits=emotion_logits, hidden=hidden,
                       loss=loss, lm_loss=lm_loss, emotion_loss=emo_loss,
                       cache=new_cache)
