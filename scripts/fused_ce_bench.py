"""Microbenchmark: fused softmax-xent kernel block sweep at the training
shape (N=B*L tokens, V=50271, D=768). Times value+grad per call.

Env: FC_N, FC_V, FC_D, FC_REPS, FC_CHAIN, FC_BLOCKS ("bn:bv,bn:bv,...").
Appends JSON lines to results/fused_ce_bench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("FC_N", 48 * 512))
V = int(os.environ.get("FC_V", 50271))
D = int(os.environ.get("FC_D", 768))
REPS = int(os.environ.get("FC_REPS", 3))
CHAIN = int(os.environ.get("FC_CHAIN", 8))
BLOCKS = os.environ.get("FC_BLOCKS", "256:1024,128:1024,512:1024,256:512,256:2048,512:512")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "fused_ce_bench.jsonl")


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.ops.fused_ce import fused_softmax_xent

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((V, D)), jnp.bfloat16)
    lbl = jnp.asarray(rng.integers(0, V, (N,)), jnp.int32)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for spec in BLOCKS.split(","):
        bn, bv = (int(x) for x in spec.split(":"))

        def loss(h, w):
            return jnp.sum(fused_softmax_xent(h, w, lbl, bn, bv, False))

        grad = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def run(h, w):
            out = 0.0
            for _ in range(CHAIN):
                v, g = grad(h + out, w)
                out = v * 1e-20 + jnp.sum(g[0].astype(jnp.float32)) * 1e-20
            return out

        try:
            t0 = time.time()
            np.asarray(run(h, w))
            compile_s = time.time() - t0
            times = []
            for _ in range(REPS):
                t0 = time.time()
                np.asarray(run(h, w))
                times.append((time.time() - t0) / CHAIN)
            best = min(times)
            res = {"bn": bn, "bv": bv, "N": N, "V": V, "D": D,
                   "ms_per_call": round(best * 1e3, 2),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # noqa: BLE001
            res = {"bn": bn, "bv": bv, "N": N, "V": V, "D": D,
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps(res), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
