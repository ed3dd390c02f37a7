"""Microbench: batched-rows prefill attention kernel vs the XLA path at
the headline prefill shape (B=256, H=12, L=128, Dh=64), 12 chained
layer-applications per invocation so device time dominates the tunnel
floor. Appends results/prefill_kernel_bench.jsonl."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "prefill_kernel_bench.jsonl")
B = int(os.environ.get("PB", 256))
H, L, DH = 12, int(os.environ.get("PL", 128)), 64
NL = 12


def main():
    import jax
    import jax.numpy as jnp
    from ergm_tpu.ops import prefill_attention
    from ergm_tpu.ops.attention import xla_attention
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    D = H * DH
    qm = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    km = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    vm = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    scale = 1.0 / DH ** 0.5

    def split(x):
        return x.reshape(B, L, H, DH).transpose(0, 2, 1, 3)

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(B, L, D)

    def xla_12(qm, km, vm):
        x = qm
        for _ in range(NL):
            o = xla_attention(split(x), split(km), split(vm), causal=True,
                              scale=scale)
            x = merge(o)
        return x

    def kern_12(qm, km, vm):
        x = qm
        for _ in range(NL):
            x = prefill_attention.prefill_mha(x, km, vm, None, n_head=H,
                                              scale=scale)
        return x

    def time_fn(fn, label):
        f = jax.jit(fn)
        np.asarray(f(qm, km, vm))
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            o = qm
            for _ in range(4):
                o = f(o, km, vm)
            np.asarray(o)
            best = min(best, (time.time() - t0) / 4)
        print(f"{label}: {best*1e3:.2f} ms / {NL} layers", file=sys.stderr)
        return best * 1e3

    row = {"study": "prefill_kernel_bench", "B": B, "H": H, "L": L,
           "layers": NL}
    row["xla_ms"] = time_fn(xla_12, "xla")
    row["kernel_ms"] = time_fn(kern_12, "kernel")
    row["speedup"] = round(row["xla_ms"] / row["kernel_ms"], 3)
    print(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
