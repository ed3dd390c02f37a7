"""Microbenchmark: Pallas block-skipping decode-attention kernel vs the
XLA full-read path, at long cache lengths (VERDICT r1 item 8: win at
T>=1024 or delete).

Times ONE attention op (not the full model step): q [B,H,D] against a
[B,H,T,D] cache with live prefix `cur`, chained CHAIN times per fetch.

Env: DK_BATCH, DK_HEADS, DK_T, DK_BLOCK, DK_CHAIN, DK_REPS.
Appends JSON lines to results/decode_kernel_bench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("DK_BATCH", 128))
H = int(os.environ.get("DK_HEADS", 12))
D = int(os.environ.get("DK_D", 64))
T = int(os.environ.get("DK_T", 1024))
BLOCK = int(os.environ.get("DK_BLOCK", 256))
CHAIN = int(os.environ.get("DK_CHAIN", 64))
REPS = int(os.environ.get("DK_REPS", 3))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "decode_kernel_bench.jsonl")


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.ops.decode_attention import (decode_attention,
                                               decode_attention_reference)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.float32)
    scale = 1.0 / D ** 0.5

    def chain(fn):
        @jax.jit
        def run(q, k, v, cur):
            out = q
            for _ in range(CHAIN):
                out = fn(out, k, v, cur, mask, scale=scale)
            return out
        return run

    kern = chain(lambda *a, **kw: decode_attention(*a, block_k=BLOCK, **kw))
    ref = chain(decode_attention_reference)

    results = []
    for cur in (128, 256, 512, T):
        cur_a = jnp.asarray(cur, jnp.int32)
        for name, fn in (("pallas", kern), ("xla", ref)):
            o = fn(q, k, v, cur_a)
            np.asarray(o)  # compile + completion barrier
            times = []
            for _ in range(REPS):
                t0 = time.time()
                np.asarray(fn(q, k, v, cur_a))
                times.append((time.time() - t0) / CHAIN)
            best = min(times)
            res = {"impl": name, "B": B, "H": H, "D": D, "T": T,
                   "block_k": BLOCK if name == "pallas" else None,
                   "cur": cur, "us_per_op": round(best * 1e6, 1),
                   "gb_per_s": round(B * H * cur * D * 2 * 2 / best / 1e9, 1)}
            results.append(res)
            print(json.dumps(res), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
