"""Parity: batched-rows int8 decode self-attention kernel vs the
scale-factored XLA math (gpt2._self_attention_cached's int8 long-cache
branch). The kernel is a MEASURED DECLINE (0.067x XLA, device trace)
and ships default-off as the round-5 whole-layer-kernel experiment;
these tests keep the experiment honest."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ergm_tpu.ops import decode_attention


@pytest.mark.parametrize("B,H,T,index", [
    (8, 2, 256, 100), (16, 4, 256, 255), (8, 2, 512, 17),
])
def test_decode_kernel_matches_factored_math(B, H, T, index):
    Dh = 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, Dh)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (B, H, T, Dh)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, H, T, Dh)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (B, H, T, 1)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (B, H, T, 1)), jnp.float32)
    scale = 1.0 / Dh ** 0.5

    # reference: the XLA scale-factored formulation
    s = jnp.einsum("bhqd,bhtd->bhqt", q, kq.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    s = s * ks[..., 0][:, :, None, :]
    kpos = jnp.arange(T)[None, None, None, :]
    s = jnp.where(kpos <= index, s, -1e9)
    probs = jax.nn.softmax(s, axis=-1)
    pv = probs * vs[..., 0][:, :, None, :]
    want = jnp.einsum("bhqt,bhtd->bhqd", pv, vq.astype(jnp.float32))
    want = want[:, :, 0, :].reshape(B, H * Dh)

    class Cfg:
        head_dim = Dh
        n_head = H
    os.environ["ERGM_DECODE_KERNEL"] = "1"   # default-off (measured decline)
    try:
        assert decode_attention.supported(B, T, Cfg)
    finally:
        del os.environ["ERGM_DECODE_KERNEL"]
    got = decode_attention.decode_mha_int8(
        q, kq, vq, ks, vs, index, scale, n_head=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
