"""Block-size sweep for the fused softmax-xent kernel (ops/fused_ce.py).

Measures fwd+bwd wall time of fused_lm_loss at the training shape
(B*L=24576 tokens, D=768, V=50271 — the gpt2 B=48 x L=512 step) across
(block_n, block_v) tilings, on the default device.

    python scripts/ce_block_sweep.py

Appends one JSON line per config to results/ce_block_sweep.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "ce_block_sweep.jsonl")

TOKENS = int(os.environ.get("CE_SWEEP_TOKENS", 48 * 512))
D = int(os.environ.get("CE_SWEEP_D", 768))
V = int(os.environ.get("CE_SWEEP_V", 50271))
REPS = int(os.environ.get("CE_SWEEP_REPS", 20))

CONFIGS = [(128, 1024), (256, 1024), (512, 1024), (1024, 1024),
           (256, 2048), (512, 2048), (256, 4096), (512, 4096)]


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.ops.fused_ce import fused_lm_loss
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, L = TOKENS // 512, 512
    hidden = jnp.asarray(rng.standard_normal((B, L, D)) * 0.02, jnp.bfloat16)
    wte = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)

    for bn, bv in CONFIGS:
        f = jax.jit(jax.value_and_grad(
            lambda h, w: fused_lm_loss(h, w, labels, block_n=bn, block_v=bv),
            argnums=(0, 1)))
        try:
            (loss, grads) = f(hidden, wte)
            jax.block_until_ready(grads)
        except Exception as e:  # OOM / unsupported tiling: record and move on
            row = {"block_n": bn, "block_v": bv, "error": str(e)[:200]}
            print(json.dumps(row), flush=True)
            with open(OUT, "a") as fh:
                fh.write(json.dumps(row) + "\n")
            continue
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(hidden, wte)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        row = {"block_n": bn, "block_v": bv, "tokens": TOKENS, "d": D,
               "v": V, "fwd_bwd_ms": round(ms, 3),
               "loss": float(loss)}
        print(json.dumps(row), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
