"""Fused softmax cross-entropy kernel (ops/fused_ce.py) vs the dense
oracle — values AND gradients (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.models.gpt2 import chunked_lm_loss
from ergm_tpu.ops.fused_ce import fused_lm_loss, fused_softmax_xent


def dense_nll(hidden, wte, labels):
    logits = (hidden.astype(jnp.float32) @ wte.astype(jnp.float32).T)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, jnp.maximum(labels, 0)[:, None], axis=1)[:, 0]
    return logz - gold


@pytest.mark.parametrize("n,v,d", [(16, 300, 32), (24, 97, 64)])
def test_forward_matches_dense(n, v, d):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    lbl = jnp.asarray(rng.integers(0, v, (n,)), jnp.int32)
    got = fused_softmax_xent(h, w, lbl, 8, 128, True)
    want = dense_nll(h, w, lbl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_dense():
    rng = np.random.default_rng(1)
    n, v, d = 16, 300, 32
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    lbl = np.asarray(rng.integers(0, v, (n,)), np.int32)
    lbl[3] = -100  # ignored rows contribute nothing
    lbl = jnp.asarray(lbl)
    gvec = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    gvec = jnp.where(lbl < 0, 0.0, gvec)  # callers zero ignored rows

    def fused(h, w):
        return jnp.sum(fused_softmax_xent(h, w, lbl, 8, 128, True) * gvec)

    def dense(h, w):
        nll = dense_nll(h, w, lbl)
        return jnp.sum(jnp.where(lbl < 0, 0.0, nll) * gvec)

    gh1, gw1 = jax.grad(fused, argnums=(0, 1))(h, w)
    gh2, gw2 = jax.grad(dense, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-5)


def test_lm_loss_matches_chunked():
    """fused_lm_loss == chunked_lm_loss (same shift/mask/mean semantics)."""
    rng = np.random.default_rng(2)
    B, L, D, V = 2, 24, 32, 150
    hidden = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wte = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    labels = np.asarray(rng.integers(0, V, (B, L)), np.int32)
    labels[:, :7] = -100  # left-padded history mask
    labels = jnp.asarray(labels)

    got = fused_lm_loss(hidden, wte, labels, block_n=8, block_v=128,
                        interpret=True)
    want = chunked_lm_loss(hidden, wte, labels, chunk=8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # gradients agree too
    g1 = jax.grad(lambda h: fused_lm_loss(h, wte, labels, block_n=8,
                                          block_v=128, interpret=True))(hidden)
    g2 = jax.grad(lambda h: chunked_lm_loss(h, wte, labels, chunk=8))(hidden)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_sharded_matches_unsharded():
    """fused_lm_loss_sharded on an 8-device data mesh == fused_lm_loss:
    loss AND grads (dh per shard, psum'd replicated-wte cotangent)."""
    from ergm_tpu.core.mesh import make_mesh
    from ergm_tpu.ops.fused_ce import fused_lm_loss_sharded

    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == 8
    rng = np.random.default_rng(3)
    B, L, D, V = 8, 12, 32, 150
    hidden = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    wte = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    labels = np.asarray(rng.integers(0, V, (B, L)), np.int32)
    labels[:, :5] = -100
    labels[3, :] = -100  # one shard with zero supervised tokens
    labels = jnp.asarray(labels)

    def sharded(h, w):
        return fused_lm_loss_sharded(h, w, labels, mesh, block_n=8,
                                     block_v=128, interpret=True)

    def local(h, w):
        return fused_lm_loss(h, w, labels, block_n=8, block_v=128,
                             interpret=True)

    np.testing.assert_allclose(float(sharded(hidden, wte)),
                               float(local(hidden, wte)), rtol=1e-6)
    gs = jax.grad(sharded, argnums=(0, 1))(hidden, wte)
    gl = jax.grad(local, argnums=(0, 1))(hidden, wte)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gl[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gl[1]),
                               rtol=1e-5, atol=1e-6)


def test_sharded_rejects_tp_mesh():
    from ergm_tpu.core.mesh import make_mesh
    from ergm_tpu.ops.fused_ce import fused_lm_loss_sharded

    mesh = make_mesh((4, 2), ("data", "model"))
    h = jnp.zeros((8, 4, 32))
    w = jnp.zeros((64, 32))
    lbl = jnp.zeros((8, 4), jnp.int32)
    with pytest.raises(ValueError, match="pure"):
        fused_lm_loss_sharded(h, w, lbl, mesh, interpret=True)


def test_forward_gate_uses_sharded_fused_on_dp_mesh():
    """gpt2.forward(lm_loss_impl='fused', mesh=DP mesh) equals the
    chunked loss, end to end through the model."""
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.core.mesh import make_mesh
    from ergm_tpu.models import gpt2

    mesh = make_mesh((-1,), ("data",))
    cfg = ModelConfig.from_model_type("gpt2", n_layer=2, n_embd=32, n_head=4,
                                      vocab_size=128, n_positions=32,
                                      dtype="float32", lm_loss_impl="fused")
    cfg_ref = cfg.replace(lm_loss_impl="chunked")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 120, (8, 16)), jnp.int32)

    loss = jax.jit(lambda p: gpt2.forward(
        p, cfg, ids, labels=ids, compute_logits=False, mesh=mesh).loss)(params)
    want = jax.jit(lambda p: gpt2.forward(
        p, cfg_ref, ids, labels=ids, compute_logits=False).loss)(params)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_block_v_resolution_is_width_aware():
    """Vocab tiling resolves from the embedding width: the dW backward's
    scoped-VMEM footprint scales with (block_v/2)*D — measured limits on
    v5e: 2048 fits at D=768, 1024 at D=1024/1280, 512 at D=1600
    (results/ce_block_sweep.jsonl; gpt2-xl compile evidence in the
    round-3 log). Explicit block_v always wins."""
    from ergm_tpu.ops.fused_ce import _resolve_block_v

    assert _resolve_block_v(None, 768) == 2048   # gpt2
    assert _resolve_block_v(None, 1024) == 1024  # gpt2-medium
    assert _resolve_block_v(None, 1280) == 1024  # gpt2-large
    assert _resolve_block_v(None, 1600) == 512   # gpt2-xl
    assert _resolve_block_v(None, 32) == 2048    # test-sized models
    assert _resolve_block_v(4096, 1600) == 4096  # explicit override
