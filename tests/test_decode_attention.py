"""Pallas decode-attention kernel vs the XLA oracle (interpret mode on
CPU; scripts/tpu_validate.py covers the compiled TPU path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.ops.decode_attention import decode_attention, decode_attention_reference


@pytest.mark.parametrize("cur", [1, 100, 128, 200, 256])
def test_kernel_matches_oracle(cur):
    B, H, T, D = 2, 4, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    mask = jnp.asarray((rng.random((B, T)) > 0.2), jnp.float32)
    scale = 1 / np.sqrt(D)
    out = decode_attention(q, k, v, jnp.int32(cur), mask, scale=scale,
                           block_k=128, interpret=True)
    ref = decode_attention_reference(q, k, v, jnp.int32(cur), mask, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_kernel_empty_rows():
    """A row whose mask is all-zero must not produce NaNs."""
    B, H, T, D = 1, 2, 128, 64
    q = jnp.ones((B, H, D))
    k = jnp.ones((B, H, T, D))
    v = jnp.ones((B, H, T, D))
    mask = jnp.zeros((B, T))
    out = decode_attention(q, k, v, jnp.int32(5), mask, scale=0.125,
                           block_k=128, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
