"""Device-trace A/B: batched-rows int8 decode attention kernel vs the
XLA scale-factored math, at the headline decode shape (B=256, H=12,
T=256, int8 KV). 12 chained layer-applications per program; XPlane
self-times (tunnel-immune). Appends results/decode_kernel_bench.jsonl.
"""
from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "decode_kernel_bench.jsonl")
B, H, T, DH, NL = 256, 12, int(os.environ.get("DT", 256)), 64, 12


def main():
    import jax
    import jax.numpy as jnp
    from decode_trace import summarize_xplane
    from ergm_tpu.ops import decode_attention
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, DH)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (NL, B, H, T, DH)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (NL, B, H, T, DH)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (NL, B, H, T, 1)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (NL, B, H, T, 1)), jnp.float32)
    scale = 1.0 / DH ** 0.5
    index = T - 2
    dt = jnp.bfloat16

    def xla_12(q, kq, vq, ks, vs):
        x = q
        for li in range(NL):
            # the in-model scale-factored path (gpt2.py int8 branch)
            s = jnp.einsum("bhqd,bhtd->bhqt", x.astype(dt),
                           kq[li].astype(dt),
                           preferred_element_type=jnp.float32,
                           precision="highest") * scale
            s = s * ks[li][..., 0][:, :, None, :]
            kpos = jnp.arange(T)[None, None, None, :]
            s = jnp.where(kpos <= index, s, -1e9)
            probs = jax.nn.softmax(s, axis=-1)
            pv = (probs * vs[li][..., 0][:, :, None, :]).astype(dt)
            o = jnp.einsum("bhqt,bhtd->bhqd", pv, vq[li].astype(dt),
                           precision="highest")
            x = o.astype(jnp.bfloat16)
        return x

    def kern_12(q, kq, vq, ks, vs):
        x = q
        for li in range(NL):
            o = decode_attention.decode_mha_int8(
                x, kq[li], vq[li], ks[li], vs[li], index, scale, n_head=H)
            x = o.reshape(B, H, DH)[:, :, None, :].astype(jnp.bfloat16)
        return x

    row = {"study": "decode_kernel_trace_r5", "B": B, "H": H, "T": T,
           "layers": NL}
    for kind, fn in (("xla", xla_12), ("kernel", kern_12)):
        f = jax.jit(fn)
        np.asarray(f(q, kq, vq, ks, vs))
        d = f"/tmp/dk_{kind}"
        jax.profiler.start_trace(d)
        np.asarray(f(q, kq, vq, ks, vs))
        jax.profiler.stop_trace()
        top, err = summarize_xplane(d)
        total = sum(o["ms"] for o in top) if top else None
        row[f"{kind}_device_ms"] = round(total, 3) if total else None
        row[f"{kind}_err"] = err
        print(f"{kind}: {total} ms / {NL} layers (err={err})",
              file=sys.stderr)
        for o in (top or [])[:4]:
            print(f'   {o["ms"]:8.3f} x{o["count"]:<4} {o["op"][:36]} '
                  f'{o["shape"][:60]}', file=sys.stderr)
    if row.get("xla_device_ms") and row.get("kernel_device_ms"):
        row["speedup"] = round(row["xla_device_ms"]
                               / row["kernel_device_ms"], 3)
    print(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
