"""Microbenchmark: self-attention fwd+bwd at the training shape
(B=48, H=12, L=512, D=64 by default) across backends/block configs:

  flash-<bq>x<bk>  - library Pallas flash kernel (ops/flash_attention's
                     backend) at the given block sizes
  splash           - library Pallas splash kernel (causal block skipping,
                     fused q-head grid) via make_splash_mha
  block[-sN][-dropP] - ergm_tpu fused block kernel (whole-sequence VMEM,
                     single-pass backward) with N causal q-sub-blocks
                     and optional attention dropout rate P (e.g.
                     block-s2, block-s1-drop0.1)
  xla              - plain einsum attention (the oracle path)

Times sum-of-squares grad (fwd+bwd) per call, CHAIN calls per fetch.
Appends JSON lines to results/attn_kernel_bench.jsonl.

Env: AK_BATCH, AK_HEADS, AK_L, AK_D, AK_REPS, AK_CHAIN, AK_VARIANTS
(comma list).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("AK_BATCH", 48))
H = int(os.environ.get("AK_HEADS", 12))
L = int(os.environ.get("AK_L", 512))
D = int(os.environ.get("AK_D", 64))
REPS = int(os.environ.get("AK_REPS", 3))
CHAIN = int(os.environ.get("AK_CHAIN", 8))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "attn_kernel_bench.jsonl")

DEFAULT_VARIANTS = ["flash-512x512", "flash-256x256", "flash-128x128",
                    "flash-256x512", "flash-512x256", "splash", "xla"]


def make_fn(variant):
    import jax
    import jax.numpy as jnp

    scale = 1.0 / D ** 0.5

    if variant.startswith("flash-"):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        # flash-QxK[-bN][-dkvQxK][-dqQxK]: fwd blocks, optional batch
        # block, optional separate backward dKV / dQ blocks
        parts = variant.split("-")
        bq, bk = (int(x) for x in parts[1].split("x"))
        bb = 1
        dkv_q, dkv_k, dq_q, dq_k = bq, bk, bq, bk
        for p_ in parts[2:]:
            if p_.startswith("dkv"):
                dkv_q, dkv_k = (int(x) for x in p_[3:].split("x"))
            elif p_.startswith("dq"):
                dq_q, dq_k = (int(x) for x in p_[2:].split("x"))
            elif p_.startswith("b"):
                bb = int(p_[1:])
        bs = fa.BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=bb,
            block_q_major_dkv=dkv_q, block_k_major_dkv=dkv_k,
            block_k_dkv=dkv_k, block_q_dkv=dkv_q,
            block_k_major_dq=dq_k, block_k_dq=dq_k, block_q_dq=dq_q,
        )

        def attn(q, k, v):
            return fa.flash_attention(q, k, v, causal=True, sm_scale=scale,
                                      block_sizes=bs)
    elif variant == "splash":
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk, splash_attention_mask as sm)

        mask = sm.MultiHeadMask([sm.CausalMask((L, L)) for _ in range(H)])
        kernel = sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1)
        kernel = jax.vmap(kernel)  # over batch; kernel itself is [H, L, D]

        def attn(q, k, v):
            return kernel(q * scale, k, v)
    elif variant.startswith("block"):
        from ergm_tpu.ops import block_attention as ba

        if not hasattr(ba, "_orig_pick_subs"):
            ba._orig_pick_subs = ba._pick_subs
        ba._pick_subs = ba._orig_pick_subs  # reset any prior pin
        drop = 0.0
        for p_ in variant.split("-")[1:]:
            if p_.startswith("drop"):
                drop = float(p_[4:])
            elif p_.startswith("s"):
                subs = int(p_[1:])
                ba._pick_subs = (lambda *a, _s=subs, **kw: _s)  # pin sweep

        def attn(q, k, v):
            return ba.block_mha(q, k, v, causal=True, scale=scale,
                                dropout_rate=drop,
                                dropout_seed=(jnp.int32(7) if drop else None))
    elif variant == "xla":
        def attn(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
            causal = jnp.tril(jnp.ones((L, L), bool))
            s = jnp.where(causal, s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)
    else:
        raise ValueError(variant)

    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        out = 0.0
        for i in range(CHAIN):
            g = grad(q + out, k, v)  # serialize via data dependency
            out = jnp.sum(g[0].astype(jnp.float32) ** 2) * 1e-12
        return out

    return run


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    variants = (os.environ.get("AK_VARIANTS", "").split(",")
                if os.environ.get("AK_VARIANTS") else
                (sys.argv[1:] or DEFAULT_VARIANTS))
    for name in variants:
        try:
            fn = make_fn(name)
            t0 = time.time()
            np.asarray(fn(q, k, v))
            compile_s = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                np.asarray(fn(q, k, v))
                times.append((time.time() - t0) / CHAIN)
            best = min(times)
            res = {"variant": name, "B": B, "H": H, "L": L, "D": D,
                   "ms_per_call": round(best * 1e3, 2),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001 - record and move on
            res = {"variant": name, "B": B, "H": H, "L": L, "D": D,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(res), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
