"""Fused block attention kernel (ergm_tpu/ops/block_attention.py) vs the
XLA oracle (ergm_tpu/ops/attention.py math), in Pallas interpret mode on
CPU. The on-TPU compiled path is exercised by scripts/attn_kernel_bench.py
and scripts/tpu_validate.py; numerics there are bf16 (~5e-3)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.ops import block_attention as ba
from ergm_tpu.ops.attention import attention_bias_from_mask, xla_attention

B, H, L, D = 2, 2, 256, 64


def _inputs(rng_np, lk=L):
    q = jnp.asarray(rng_np.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, H, lk, D)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((B, H, lk, D)), jnp.float32)
    kv_mask = jnp.asarray(rng_np.integers(0, 2, (B, lk)).astype(np.int32))
    kv_mask = kv_mask.at[:, :8].set(1)  # early keys valid for causal row 0
    return q, k, v, kv_mask


@pytest.mark.parametrize("causal", [True, False])
def test_matches_xla_forward_and_grads(rng_np, causal):
    q, k, v, kv_mask = _inputs(rng_np)

    def f_blk(q, k, v):
        return ba.block_mha(q, k, v, causal=causal, kv_mask=kv_mask,
                            interpret=True)

    def f_xla(q, k, v):
        return xla_attention(q, k, v, causal=causal,
                             bias=attention_bias_from_mask(kv_mask))

    np.testing.assert_allclose(f_blk(q, k, v), f_xla(q, k, v),
                               atol=2e-5, rtol=2e-5)

    def loss(f):
        return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

    g_blk = jax.grad(loss(f_blk), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss(f_xla), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_blk, g_xla):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-5)


def test_cross_shape_non_causal(rng_np):
    """Cross-attention shape: Lq != Lk, non-causal."""
    lk = 128
    q, k, v, kv_mask = _inputs(rng_np, lk=lk)
    o_blk = ba.block_mha(q, k, v, causal=False, kv_mask=kv_mask,
                         interpret=True)
    o_xla = xla_attention(q, k, v, causal=False,
                          bias=attention_bias_from_mask(kv_mask))
    np.testing.assert_allclose(o_blk, o_xla, atol=2e-5, rtol=2e-5)


def test_padded_query_rows_zero(rng_np):
    q, k, v, kv_mask = _inputs(rng_np)
    q_mask = jnp.ones((B, L), jnp.int32).at[:, -32:].set(0)
    o = ba.block_mha(q, k, v, causal=True, q_mask=q_mask, kv_mask=kv_mask,
                     interpret=True)
    assert float(jnp.abs(o[:, :, -32:, :]).max()) == 0.0
    # valid rows unaffected by the q padding
    o_full = ba.block_mha(q, k, v, causal=True, kv_mask=kv_mask,
                          interpret=True)
    np.testing.assert_allclose(o[:, :, :-32], o_full[:, :, :-32], atol=1e-6)


def test_sub_block_counts_agree(rng_np):
    """Causal q-sub-blocking is a pure schedule choice: same values."""
    q, k, v, kv_mask = _inputs(rng_np)
    outs = []
    orig = ba._pick_subs
    try:
        for subs in (1, 2, 4):
            ba._pick_subs = lambda *a, _s=subs, **kw: _s
            outs.append(ba.block_mha(q, k, v, causal=True, kv_mask=kv_mask,
                                     interpret=True))
    finally:
        ba._pick_subs = orig
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6, rtol=1e-6)


def test_dropout_deterministic_and_scaled(rng_np):
    q, k, v, kv_mask = _inputs(rng_np)
    f = functools.partial(ba.block_mha, causal=True, kv_mask=kv_mask,
                          dropout_rate=0.3, interpret=True)
    o1 = f(q, k, v, dropout_seed=jnp.int32(7))
    o2 = f(q, k, v, dropout_seed=jnp.int32(7))
    o3 = f(q, k, v, dropout_seed=jnp.int32(8))
    np.testing.assert_array_equal(o1, o2)  # same seed -> same program output
    assert float(jnp.abs(o1 - o3).max()) > 0  # different seed -> different
    # expectation over seeds approaches the no-dropout output
    o0 = ba.block_mha(q, k, v, causal=True, kv_mask=kv_mask, interpret=True)
    mean = np.mean([np.asarray(f(q, k, v, dropout_seed=jnp.int32(s)))
                    for s in range(24)], axis=0)
    err = np.abs(mean - np.asarray(o0)).mean()
    base = np.abs(np.asarray(o0)).mean()
    assert err / base < 0.25, (err, base)


def _interp_keep_mask(seed, b, h, n_heads, lq, lk, rate):
    """Numpy replica of the kernel's interpret-mode hash stream."""
    mix = np.uint32(np.int64(seed) + b * n_heads + h)
    r, c = np.meshgrid(np.arange(lq, dtype=np.uint32),
                       np.arange(lk, dtype=np.uint32), indexing="ij")
    with np.errstate(over="ignore"):
        x = r * np.uint32(lk) + c + mix * np.uint32(2654435761)
        x ^= x >> np.uint32(16)
        x *= np.uint32(0x7FEB352D)
        x ^= x >> np.uint32(15)
        x *= np.uint32(0x846CA68B)
        x ^= x >> np.uint32(16)
    return x >= np.uint32(min(rate * 2**32, 2**32 - 1))


def test_dropout_forward_and_grads_match_reference(rng_np):
    """The backward regenerates the keep mask bit-identically: both the
    forward and the custom-VJP grads must match a pure-jnp reference
    attention using the recovered keep mask."""
    lq, rate = 128, 0.2
    nB, nH = 2, 2
    q = jnp.asarray(rng_np.standard_normal((nB, nH, lq, D)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((nB, nH, lq, D)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((nB, nH, lq, D)), jnp.float32)
    seed = 11
    keep = jnp.asarray(np.stack([
        np.stack([_interp_keep_mask(seed, b, h, nH, lq, lq, rate)
                  for h in range(nH)]) for b in range(nB)]))

    def f_kernel(q, k, v):
        return ba.block_mha(q, k, v, causal=True, dropout_rate=rate,
                            dropout_seed=jnp.int32(seed), interpret=True)

    def f_ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        causal = jnp.tril(jnp.ones((lq, lq), bool))
        s = jnp.where(causal, s, -1e9)
        pn = jax.nn.softmax(s, axis=-1)
        pn = jnp.where(keep, pn / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", pn, v)

    np.testing.assert_allclose(f_kernel(q, k, v), f_ref(q, k, v),
                               atol=2e-5, rtol=2e-5)

    def loss(f):
        return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

    g_kernel = jax.grad(loss(f_kernel), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(f_ref), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-5)


def test_supported_predicate():
    mk = lambda lq, lk, d: (jnp.zeros((1, 1, lq, d)), jnp.zeros((1, 1, lk, d)),
                            jnp.zeros((1, 1, lk, d)))
    q, k, v = mk(512, 512, 64)
    assert ba.block_attention_supported(q, k, v, causal=True)
    q, k, v = mk(512, 512, 64)
    assert not ba.block_attention_supported(q, k, v, causal=True,
                                            causal_offset=3)
    q, k, v = mk(2048, 2048, 64)  # over the VMEM budget
    assert not ba.block_attention_supported(q, k, v, causal=True)
    q, k, v = mk(512, 200, 64)  # non-128-multiple kv
    assert not ba.block_attention_supported(q, k, v, causal=False)
    q, k, v = mk(512, 256, 64)  # ragged causal
    assert not ba.block_attention_supported(q, k, v, causal=True)
    q, k, v = mk(256, 128, 64)  # cross shape, non-causal
    assert ba.block_attention_supported(q, k, v, causal=False)
