"""On-TPU validation: Pallas attention backends vs XLA reference math.

Run manually on a machine with a TPU attached (the CI test suite runs on
CPU where the Pallas TPU kernels can't execute):

    python scripts/tpu_validate.py

Checks, at training shapes (L=512, bf16):
- forward parity: pallas (block kernel where supported, else flash)
  vs XLA path, causal self-attention; plus explicitly pinned
  impl='block' and impl='flash' backends
- masked parity: segment-id masking vs additive-bias masking
- gradient parity through the custom VJPs
- in-kernel attention dropout (block backend): determinism per seed and
  mean-over-seeds convergence to the no-dropout output
- full-model forward: attention_impl='pallas' vs 'xla'
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# runnable as `python scripts/tpu_validate.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend")
        return 0
    from ergm_tpu.ops.attention import multihead_attention

    B, H, L, D = 2, 8, 512, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    mask = jnp.asarray((rng.random((B, L)) > 0.2), jnp.float32)

    ok = True

    def check(name, a, b, tol):
        nonlocal ok
        e = rel_err(a, b)
        status = "OK " if e < tol else "FAIL"
        if e >= tol:
            ok = False
        print(f"{status} {name}: rel_err={e:.2e} (tol {tol})")

    fl = jax.jit(lambda q, k, v: multihead_attention(q, k, v, causal=True, impl="pallas"))
    xl = jax.jit(lambda q, k, v: multihead_attention(q, k, v, causal=True, impl="xla"))
    check("causal forward", fl(q, k, v), xl(q, k, v), 2e-2)
    for pin in ("block", "flash"):
        fp = jax.jit(lambda q, k, v, _p=pin: multihead_attention(
            q, k, v, causal=True, impl=_p))
        check(f"causal forward [{pin}]", fp(q, k, v), xl(q, k, v), 2e-2)

    # in-kernel dropout (block backend): per-seed determinism + mean
    # convergence toward the deterministic output
    def drop_fn(q, k, v, key):
        return multihead_attention(q, k, v, causal=True, impl="block",
                                   dropout_rate=0.2, deterministic=False,
                                   rng=key)
    dj = jax.jit(drop_fn)
    k0 = jax.random.key(0)
    same = rel_err(dj(q, k, v, k0), dj(q, k, v, k0))
    print(f"{'OK ' if same == 0 else 'FAIL'} dropout determinism: "
          f"rel_err={same:.2e} (tol 0)")
    ok = ok and same == 0
    # convergence of the seed-mean is a STATISTICAL property: use the
    # mean-relative error (the max-norm over 524k elements rides the
    # extreme-value tail and needs thousands of seeds to tighten)
    mean = np.mean([np.asarray(dj(q, k, v, jax.random.key(s)), np.float32)
                    for s in range(64)], axis=0)
    det = np.asarray(fl(q, k, v), np.float32)
    mre = float(np.mean(np.abs(mean - det)) / (np.mean(np.abs(det)) + 1e-9))
    status = "OK " if mre < 0.1 else "FAIL"
    if mre >= 0.1:
        ok = False
    print(f"{status} dropout mean ~ deterministic: mean_rel={mre:.2e} (tol 0.1)")

    flm = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=True, kv_mask=m, q_mask=m, impl="pallas"))
    xlm = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=True, kv_mask=m, impl="xla"))
    a, b = flm(q, k, v, mask), xlm(q, k, v, mask)
    # compare only real rows (masked q rows are garbage on both paths but differ)
    sel = np.asarray(mask, bool)
    check("masked forward (real rows)",
          np.asarray(a, np.float32).transpose(0, 2, 1, 3)[sel],
          np.asarray(b, np.float32).transpose(0, 2, 1, 3)[sel], 2e-2)

    # rectangular causal: prefill queries against a longer cache buffer
    # (shared origin; tail masked) — the exact generate-prefill shape
    kr = jnp.asarray(rng.standard_normal((B, H, 2 * L, D)), jnp.bfloat16)
    vr = jnp.asarray(rng.standard_normal((B, H, 2 * L, D)), jnp.bfloat16)
    mask_r = jnp.concatenate([jnp.ones((B, L + 64)), jnp.zeros((B, L - 64))], axis=1)
    flr = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=True, kv_mask=m, impl="pallas"))
    xlr = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=True, kv_mask=m, impl="xla"))
    check("rectangular causal prefill", flr(q, kr, vr, mask_r),
          xlr(q, kr, vr, mask_r), 2e-2)

    # non-causal (cross-attention shape)
    flx = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=False, kv_mask=m, impl="pallas"))
    xlx = jax.jit(lambda q, k, v, m: multihead_attention(
        q, k, v, causal=False, kv_mask=m, impl="xla"))
    check("non-causal masked forward", flx(q, k, v, mask), xlx(q, k, v, mask), 2e-2)

    def loss_fl(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, causal=True, impl="pallas")
                       .astype(jnp.float32) ** 2)

    def loss_xl(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, causal=True, impl="xla")
                       .astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_fl, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xl, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
        check(f"grad {name}", a, b, 5e-2)

    # full model forward, flash vs xla
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2

    cfg_x = ModelConfig(vocab_size=1024, n_positions=512, n_embd=256, n_layer=2,
                        n_head=4, dtype="bfloat16", attention_impl="xla",
                        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    cfg_p = cfg_x.replace(attention_impl="pallas")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg_x)
    ids = jnp.asarray(rng.integers(0, 1024, (2, 512)), jnp.int32)
    lx = jax.jit(lambda p, i: gpt2.forward(p, cfg_x, i).logits)(params, ids)
    lp = jax.jit(lambda p, i: gpt2.forward(p, cfg_p, i).logits)(params, ids)
    check("full model logits", lp, lx, 2e-2)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
