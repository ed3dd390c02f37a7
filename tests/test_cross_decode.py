"""Parity tests for the fused cross-attention decode kernel
(ergm_tpu/ops/cross_decode.py) against the XLA lane-grouped path it
replaces (gpt2._cross_attention int8 fast path + ln_cross + residual)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2
from ergm_tpu.ops import cross_decode


def _cfg(**kw):
    kw.setdefault("use_cross_attention", True)
    return ModelConfig.from_model_type(
        "gpt2", n_layer=2, n_embd=128, n_head=2, vocab_size=120,
        n_positions=64, dtype="float32", modality_dim=128,
        cross_kv_dtype="int8", **kw)


def _setup(cfg, B=8, Lc=8, seed=0):
    rng = np.random.default_rng(seed)
    L, D, H = cfg.n_layer, cfg.n_embd, cfg.n_head
    params = gpt2.init_params(jax.random.PRNGKey(seed), cfg)
    h = jnp.asarray(rng.standard_normal((B, 1, D)), cfg.compute_dtype)
    enc = jnp.asarray(rng.standard_normal((B, Lc, D)), cfg.compute_dtype)
    # quantized cross cache stacks, built exactly like the prefill write
    # (layer-0 c_attn slice; the stacks are then tiled over layers)
    p0 = jax.tree.map(lambda x: x[0], params["blocks"]["cross_attn"]["c_attn"])
    kv = gpt2.dense(enc, p0)
    k, v = jnp.split(kv, 2, axis=-1)
    return params, h, enc, k, v


def _stacks_from_kv(cfg, k, v):
    """Quantize per-(token, head) like the prefill cross write."""
    B, Lc, D = k.shape
    H, Dh = cfg.n_head, cfg.head_dim
    L = cfg.n_layer

    def q(x):
        g = x.reshape(B, Lc, H, Dh)
        qv, s = gpt2._quantize_kv(g)
        s = s[..., 0]
        pad = gpt2._cross_scale_pad(cfg) - H
        if pad:  # lane-tile-padded scale buffers (init_kv_cache)
            s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)))
        return (qv.reshape(B, Lc, D), s)

    kq, ks = q(k)
    vq, vs = q(v)
    tile = lambda x: jnp.broadcast_to(x[None], (L,) + x.shape)
    return tile(kq), tile(vq), tile(ks), tile(vs)


@pytest.mark.parametrize("mask_mode", ["none", "partial", "empty_row"])
def test_fused_cross_decode_matches_xla_path(mask_mode):
    cfg = _cfg()
    B, Lc = 8, 8
    params, h, enc, k, v = _setup(cfg, B, Lc)
    blocks = params["blocks"]
    # per-layer slice of the stacked params, layer 1
    li = 1
    p = jax.tree.map(lambda x: x[li], {"ln_cross": blocks["ln_cross"],
                                       "cross_attn": blocks["cross_attn"]})
    stacks = _stacks_from_kv(cfg, k, v)

    if mask_mode == "none":
        enc_mask = None
    elif mask_mode == "partial":
        enc_mask = jnp.asarray(
            np.random.default_rng(1).integers(0, 2, (B, Lc)), jnp.float32)
        enc_mask = enc_mask.at[:, 0].set(1.0)
    else:
        enc_mask = jnp.ones((B, Lc), jnp.float32).at[3].set(0.0)

    # reference: the existing XLA path (ln + cross_attention + residual);
    # it consumes unpadded [B, Lc, H] scales
    H = cfg.n_head
    ckv = (stacks[0][li], stacks[1][li],
           stacks[2][li][..., :H], stacks[3][li][..., :H])
    ca_in = gpt2.layer_norm(h, p["ln_cross"], cfg.layer_norm_epsilon)
    ca_out, _ = gpt2._cross_attention(
        ca_in, None, p["cross_attn"], li, config=cfg, enc_mask=enc_mask,
        cached_kv=ckv, deterministic=True, rng=None)
    want = h + ca_out

    os.environ["ERGM_CROSS_KERNEL"] = "1"   # kernel is opt-in (default off)
    try:
        assert cross_decode.supported(h, blocks, stacks, cfg, True)
    finally:
        del os.environ["ERGM_CROSS_KERNEL"]
    sc = (1.0 / cfg.head_dim ** 0.5) if cfg.scale_attn_weights else 1.0
    prepped = cross_decode.prep_params(blocks, cfg, h.dtype)
    B_, Lc_ = h.shape[0], stacks[0].shape[2]
    mask = (jnp.ones((B_, Lc_), jnp.float32) if enc_mask is None
            else enc_mask.astype(jnp.float32))
    got = cross_decode.fused_cross_decode(
        h, prepped, jnp.int32(li), sc, stacks, mask, cfg)

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_generate_decode_uses_kernel_and_agrees():
    """End-to-end: greedy generate with int8 cross cache routes decode
    steps through the kernel (when supported) and must agree with the
    kernel disabled."""
    cfg = _cfg()
    B, Lp, Lc = 8, 8, 8
    rng = np.random.default_rng(3)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 100, (B, Lp)), jnp.int32)
    caps = jnp.asarray(rng.integers(0, 100, (B, Lc)), jnp.int32)
    from ergm_tpu.infer.generate import generate

    def run():
        out = generate(params, cfg, ids, Lp, max_len=Lp + 6, eos_id=119,
                       sp2_id=118, greedy=True, caption_ids=caps)
        return np.asarray(out.tokens)

    os.environ["ERGM_CROSS_KERNEL"] = "1"   # kernel is opt-in (default off)
    try:
        got = run()
    finally:
        del os.environ["ERGM_CROSS_KERNEL"]
        jax.clear_caches()
    want = run()
    jax.clear_caches()
    # int8-quantized scores through two formulations that differ only in
    # f32 reduction order: greedy tokens should agree on nearly all rows
    agree = (got == want).all(axis=-1).mean()
    assert agree >= 0.8, (agree, got, want)
