"""Microbench: fused cross-decode kernel vs the XLA lane-grouped path.

Isolates the cross sublayer at the headline decode shape (B=256, Lc=32,
12 layers, int8 cross cache) so kernel-vs-XLA deltas are measured
directly rather than inferred from the full bench. Sweeps the kernel's
batch-tile size. Appends JSON to results/cross_kernel_bench.jsonl.

    python scripts/cross_kernel_bench.py            # on the TPU
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "cross_kernel_bench.jsonl")

B = int(os.environ.get("XB", 256))
LC = int(os.environ.get("XLC", 32))
NL = 12
REPS = int(os.environ.get("XREPS", 30))


def main():
    import jax
    import jax.numpy as jnp
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.ops import cross_decode
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        cross_kv_dtype="int8")
    D, H = cfg.n_embd, cfg.n_head
    rng = np.random.default_rng(0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    blocks = params["blocks"]
    P = gpt2._cross_scale_pad(cfg)

    h = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.bfloat16)
    ck = jnp.asarray(rng.integers(-127, 128, (NL, B, LC, D)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (NL, B, LC, D)), jnp.int8)
    sk = np.zeros((NL, B, LC, P), np.float32)
    sk[..., :H] = rng.uniform(0.001, 0.02, (NL, B, LC, H))
    sv = np.zeros((NL, B, LC, P), np.float32)
    sv[..., :H] = rng.uniform(0.001, 0.02, (NL, B, LC, H))
    ks, vs = jnp.asarray(sk), jnp.asarray(sv)
    stacks = (ck, cv, ks, vs)
    sc = 1.0 / cfg.head_dim ** 0.5

    def xla_12(h, blocks, ck, cv, ks, vs):
        for li in range(NL):
            p = jax.tree.map(lambda x: x[li], {"ln_cross": blocks["ln_cross"],
                                               "cross_attn": blocks["cross_attn"]})
            ckv = (ck[li], cv[li], ks[li][..., :H], vs[li][..., :H])
            ca_in = gpt2.layer_norm(h, p["ln_cross"], cfg.layer_norm_epsilon)
            out, _ = gpt2._cross_attention(ca_in, None, p["cross_attn"], li,
                                           config=cfg, enc_mask=None,
                                           cached_kv=ckv, deterministic=True,
                                           rng=None)
            h = h + out
        return h

    def kern_12(h, blocks, ck, cv, ks, vs, bt=None):
        prepped = cross_decode.prep_params(blocks, cfg, h.dtype)
        mask = jnp.ones((B, LC), jnp.float32)
        for li in range(NL):
            h = cross_decode._call(
                jnp.asarray([li], jnp.int32), jnp.asarray([sc], jnp.float32),
                h[:, 0, :],
                prepped["lns"], prepped["lnb"], prepped["wq"], prepped["bq"],
                prepped["wp"], prepped["bp"],
                ck, cv, ks, vs, mask,
                eps=float(cfg.layer_norm_epsilon), n_head=H,
                head_dim=cfg.head_dim, bt=bt)[:, None, :]
        return h

    def time_fn(fn, label):
        f = jax.jit(fn)
        out = f(h, blocks, ck, cv, ks, vs)
        np.asarray(out)  # completion barrier through the tunnel
        # chain CHAIN invocations per rep, fetch once (tunnel RT amortize)
        CH = 8
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            o = h
            for _ in range(CH):
                o = f(o, blocks, ck, cv, ks, vs)
            np.asarray(o)
            best = min(best, (time.time() - t0) / CH)
        print(f"{label}: {best*1e3:.3f} ms / 12-layer pass", file=sys.stderr)
        return best * 1e3

    row = {"study": "cross_kernel_bench", "B": B, "Lc": LC, "layers": NL}
    row["xla_ms"] = time_fn(xla_12, "xla")
    for bt in (16, 32, 64, 128):
        if B % bt:
            continue
        try:
            row[f"kernel_bt{bt}_ms"] = time_fn(
                functools.partial(kern_12, bt=bt), f"kernel bt={bt}")
        except Exception as e:  # VMEM overflow etc: record and move on
            row[f"kernel_bt{bt}_ms"] = None
            row[f"kernel_bt{bt}_err"] = str(e)[:200]
            print(f"bt={bt} failed: {str(e)[:200]}", file=sys.stderr)
    print(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
