"""Parity tests: batched-rows prefill attention kernel vs the XLA
reference math (ops/attention.py::xla_attention) it replaces."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ergm_tpu.ops import prefill_attention
from ergm_tpu.ops.attention import attention_bias_from_mask, xla_attention


def _merged(x):  # [B, H, L, Dh] -> [B, L, H*Dh]
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _split(x, n_head):  # [B, L, D] -> [B, H, L, Dh]
    b, l, d = x.shape
    return x.reshape(b, l, n_head, d // n_head).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("mask_mode", ["none", "leftpad"])
@pytest.mark.parametrize("B,H,L", [(8, 2, 16), (16, 4, 32)])
def test_prefill_kernel_matches_xla(B, H, L, mask_mode):
    Dh = 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    if mask_mode == "none":
        mask = None
    else:
        m = np.ones((B, L), np.float32)
        for b in range(B):
            m[b, :rng.integers(0, L // 2)] = 0.0  # left pads
        mask = jnp.asarray(m)

    scale = 1.0 / Dh ** 0.5
    bias = attention_bias_from_mask(mask) if mask is not None else None
    want = xla_attention(q, k, v, causal=True, bias=bias, scale=scale)

    class Cfg:
        head_dim = Dh
        n_head = H
        attn_pdrop = 0.0
    assert prefill_attention.supported(B, L, Cfg, True)
    got_m = prefill_attention.prefill_mha(
        _merged(q), _merged(k), _merged(v), mask, n_head=H, scale=scale)
    got = _split(got_m, H)

    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    if mask is not None:
        # fully-masked pad QUERY rows: both paths emit junk (uniform
        # attention over -1e9 columns); compare real rows only
        keep = np.asarray(mask, bool)
        w = w * keep[:, None, :, None]
        g = g * keep[:, None, :, None]
    np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5)


def test_traced_scale_folds_into_q():
    B, H, L, Dh = 8, 2, 16, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    sc = 0.125
    want = prefill_attention.prefill_mha(
        _merged(q), _merged(k), _merged(v), None, n_head=H, scale=sc)
    got = jax.jit(lambda s: prefill_attention.prefill_mha(
        _merged(q), _merged(k), _merged(v), None, n_head=H, scale=s))(
            jnp.float32(sc))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mask_mode", ["none", "ragged"])
def test_rectangular_noncausal_matches_xla(mask_mode):
    """The cross-prefill form: Lk != Lq, causal=False, caption mask."""
    B, H, L, Lk, Dh = 8, 2, 16, 8, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, Dh)), jnp.float32)
    if mask_mode == "none":
        mask = None
    else:
        m = np.ones((B, Lk), np.float32)
        for b in range(B):
            m[b, int(rng.integers(1, Lk)):] = 0.0
        mask = jnp.asarray(m)
    scale = 1.0 / Dh ** 0.5
    bias = attention_bias_from_mask(mask) if mask is not None else None
    want = xla_attention(q, k, v, causal=False, bias=bias, scale=scale)
    got = _split(prefill_attention.prefill_mha(
        _merged(q), _merged(k), _merged(v), mask, n_head=H, scale=scale,
        causal=False), H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32),
                               rtol=2e-5, atol=2e-5)
