"""Fused decode-trunk kernel (ops/fused_decode.py) parity tests.

Off-TPU the kernel runs in Pallas interpret mode, so these validate the
kernel math itself (LN statistics, f32-accum GEMMs, GELU, residual)
against the model's unfused composition — the same oracle relationship
the TPU path has (bf16-rounding-level agreement; here in f32 it is
essentially exact)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2
from ergm_tpu.ops import fused_decode


def _mk(dtype="float32", d=128, f=512, act="gelu_new"):
    cfg = ModelConfig.from_model_type(
        "gpt2", n_layer=2, n_embd=d, n_head=4, vocab_size=120,
        n_positions=64, dtype=dtype, activation=act)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((8, 1, d)), cfg.compute_dtype)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, cfg.compute_dtype)
    ln = {"scale": jnp.asarray(rng.standard_normal(d), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(d), jnp.float32)}
    mlp = {"c_fc": {"kernel": mk(d, f), "bias": mk(f).astype(jnp.float32)},
           "c_proj": {"kernel": mk(f, d), "bias": mk(d).astype(jnp.float32)}}
    return cfg, h, ln, mlp


def _oracle(h, ln, mlp, cfg):
    x = gpt2.layer_norm(h, ln, cfg.layer_norm_epsilon)
    x = gpt2.dense(x, mlp["c_fc"])
    x = gpt2._activation(cfg.activation)(x)
    x = gpt2.dense(x, mlp["c_proj"])
    return h + x


@pytest.mark.parametrize("act", ["gelu_new", "gelu"])
def test_fused_matches_unfused(act):
    cfg, h, ln, mlp = _mk(act=act)
    assert fused_decode.supported(h, mlp, cfg)
    got = fused_decode.fused_ln_mlp(h, ln, mlp, cfg)
    want = _oracle(h, ln, mlp, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_gate_rejects_unsupported():
    cfg, h, ln, mlp = _mk()
    assert not fused_decode.supported(h[:, :1].repeat(2, 1), mlp, cfg)  # L=2
    assert not fused_decode.supported(h, mlp, cfg.replace(activation="relu"))
    qmlp = {"c_fc": {"kernel_q": mlp["c_fc"]["kernel"],
                     "kernel_scale": jnp.ones((1, 512)),
                     "bias": mlp["c_fc"]["bias"]},
            "c_proj": mlp["c_proj"]}
    assert not fused_decode.supported(h, qmlp, cfg)
    # a gpt2-xl-sized MLP at huge batch exceeds the VMEM budget
    big = jnp.zeros((4096, 1, 1600), jnp.bfloat16)
    xmlp = {"c_fc": {"kernel": jnp.zeros((1600, 6400), jnp.bfloat16),
                     "bias": jnp.zeros((6400,))},
            "c_proj": {"kernel": jnp.zeros((6400, 1600), jnp.bfloat16),
                       "bias": jnp.zeros((1600,))}}
    assert not fused_decode.supported(big, xmlp, cfg)


def test_generate_greedy_with_fused_flag():
    """End-to-end: generate with decode_fused_mlp=True matches the
    unfused run greedy-for-greedy (f32 on CPU: identical argmax)."""
    from ergm_tpu.infer.generate import generate

    cfg = ModelConfig.from_model_type(
        "gpt2", n_layer=2, n_embd=128, n_head=4, vocab_size=120,
        n_positions=64, dtype="float32")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 8)),
                      jnp.int32)
    base = generate(params, cfg, ids, 8, max_len=24, greedy=True,
                    eos_id=119, sp2_id=118)
    fcfg = cfg.replace(decode_fused_mlp=True)
    fused = generate(params, fcfg, ids, 8, max_len=24, greedy=True,
                     eos_id=119, sp2_id=118)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(fused[0]))
