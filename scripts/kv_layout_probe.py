"""Probe: merged-head vs per-head KV-cache layout for decode attention.

The decode-attention bandwidth study (results/decode_ablation.jsonl,
commit ab0c55b) measured the per-head [B, H, T, D=64] cache read running
as VPU loop fusions at ~196 (QK) / ~284 (PV) GB/s because the 64-lane
minor dim is a half tile (padded to 128) and an Lq=1 matvec never routes
to the MXU. The cross-attention cache already moved to a merged-head
[B, Lc, H*D] layout for exactly this reason (models/gpt2.py
init_kv_cache). This probe measures the same trick for the
SELF-attention decode read:

  per-head:  s = einsum('bhqd,bhtd->bhqt', q, K)        (half-tile reads)
  merged:    s = sum_d (K[b,t,:] * qf[b,:]) grouped by head
           = (Km * qf[:, None, :]).reshape(B,T,H,D).sum(-1)  (full-width)

and the PV twin. Both formulations are mathematically identical; the
merged one reads the cache at full 768-lane rows and should fuse the
multiply into a single pass (the MLP's conv fusions stream at
~645 GB/s on this chip).

Timing method: lax.scan over 12 stacked layers (carried q dependency,
mirroring the real layer loop) inside a fori_loop of N steps;
differential N (N_HI - N_LO) cancels the ~30 ms tunnel RT per fetch and
any fixed program overhead. Appends JSONL rows to
results/kv_layout_probe.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax

H, D = 12, 64
HD = H * D
N_LO = int(os.environ.get("PROBE_N_LO", 8))
N_HI = int(os.environ.get("PROBE_N_HI", 40))
REPS = int(os.environ.get("PROBE_REPS", 3))


def per_head_step(q, K, V, mask, scale):
    # q [B, HD] -> [B, H, 1, D]; K/V [B, H, T, D]
    B = q.shape[0]
    qh = q.reshape(B, H, 1, D)
    s = jnp.einsum("bhqd,bhtd->bhqt", qh, K,
                   preferred_element_type=jnp.float32) * scale
    s = s + mask[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqt,bhtd->bhqd", p.astype(K.dtype), V,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, HD).astype(q.dtype)


def merged_step(q, Km, Vm, mask, scale):
    # q [B, HD]; Km/Vm [B, T, HD]
    B, T = Km.shape[0], Km.shape[1]
    prod = Km * q[:, None, :]                      # fused into the reduce
    s = prod.reshape(B, T, H, D).sum(-1, dtype=jnp.float32) * scale  # [B,T,H]
    s = s + mask[:, :, None]
    p = jax.nn.softmax(s, axis=1)                  # over T
    w = jnp.broadcast_to(p.astype(Vm.dtype)[:, :, :, None],
                         (B, T, H, D)).reshape(B, T, HD)
    out = (Vm * w).sum(axis=1, dtype=jnp.float32)  # [B, HD]
    return out.astype(q.dtype)


def per_head_int8_step(q, K, V, ks, vs, mask, scale):
    # the shipped short-cache int8 path: dequantize the slice, then the
    # same fused attention (models/gpt2.py T<512 branch)
    k = K.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16)
    v = V.astype(jnp.bfloat16) * vs.astype(jnp.bfloat16)
    return per_head_step(q, k, v, mask, scale)


def merged_int8_step(q, Km, Vm, ksm, vsm, mask, scale):
    # scales factor out of both dots: s[b,t,h] = ks[b,t,h] * sum_d Kq*q
    B, T = Km.shape[0], Km.shape[1]
    prod = Km.astype(jnp.bfloat16) * q[:, None, :]
    s = prod.reshape(B, T, H, D).sum(-1, dtype=jnp.float32)
    s = s * ksm.astype(jnp.float32) * scale + mask[:, :, None]
    p = jax.nn.softmax(s, axis=1)
    pw = p * vsm.astype(jnp.float32)               # fold V scale into probs
    w = jnp.broadcast_to(pw.astype(jnp.bfloat16)[:, :, :, None],
                         (B, T, H, D)).reshape(B, T, HD)
    out = (Vm.astype(jnp.bfloat16) * w).sum(axis=1, dtype=jnp.float32)
    return out.astype(q.dtype)


def build(variant, B, T, key):
    scale = 1.0 / D ** 0.5

    # ALL array creation runs inside one jitted setup program: EAGER ops
    # at GB scale are ~100x slower through the axon tunnel (measured:
    # 84.6 s for one eager 1.2 GB jax.random.normal vs 8.9 s jitted
    # incl. compile, 0.7 s steady) — the original eager build made the
    # probe look wedged.
    def setup(key):
        ks = jax.random.split(key, 6)
        filled = (3 * T) // 4  # ~3/4 filled cache tail mask [B, T]
        mask = jnp.where(jnp.arange(T)[None, :] < filled, 0.0, -1e9)
        mask = jnp.broadcast_to(mask, (B, T)).astype(jnp.float32)
        q0 = jax.random.normal(ks[0], (B, HD), jnp.bfloat16)
        if variant == "per_head":
            K = jax.random.normal(ks[1], (12, B, H, T, D), jnp.bfloat16)
            V = jax.random.normal(ks[2], (12, B, H, T, D), jnp.bfloat16)
            return q0, (K, V), mask
        if variant == "merged":
            K = jax.random.normal(ks[1], (12, B, T, HD), jnp.bfloat16)
            V = jax.random.normal(ks[2], (12, B, T, HD), jnp.bfloat16)
            return q0, (K, V), mask
        if variant == "per_head_int8":
            K = jax.random.randint(ks[1], (12, B, H, T, D), -127, 127, jnp.int8)
            V = jax.random.randint(ks[2], (12, B, H, T, D), -127, 127, jnp.int8)
            ksc = jax.random.uniform(ks[3], (12, B, H, T, 1), jnp.float32, 0.01, 0.02)
            vsc = jax.random.uniform(ks[4], (12, B, H, T, 1), jnp.float32, 0.01, 0.02)
            return q0, (K, V, ksc, vsc), mask
        if variant == "merged_int8":
            K = jax.random.randint(ks[1], (12, B, T, HD), -127, 127, jnp.int8)
            V = jax.random.randint(ks[2], (12, B, T, HD), -127, 127, jnp.int8)
            ksc = jax.random.uniform(ks[3], (12, B, T, H), jnp.float32, 0.01, 0.02)
            vsc = jax.random.uniform(ks[4], (12, B, T, H), jnp.float32, 0.01, 0.02)
            return q0, (K, V, ksc, vsc), mask
        raise ValueError(variant)

    q0, xs, mask = jax.jit(setup)(key)

    if variant == "per_head":
        step = lambda q, x, m: (per_head_step(q, x[0], x[1], m, scale), None)
    elif variant == "merged":
        step = lambda q, x, m: (merged_step(q, x[0], x[1], m, scale), None)
    elif variant == "per_head_int8":
        step = lambda q, x, m: (per_head_int8_step(q, *x, m, scale), None)
    else:
        step = lambda q, x, m: (merged_int8_step(q, *x, m, scale), None)

    # NOTE: xs/mask must be ARGUMENTS of the jitted fn, not closure
    # captures — captured device arrays embed as HLO constants, and the
    # ~GB cache tensors then serialize through the remote-compile tunnel
    # (observed: a 10+ minute compile stall for this trivial program)
    def n_steps(n, q0, xs, mask):
        def body(_, q):
            q, _n = lax.scan(lambda q, x: step(q, x, mask), q, xs)
            return q
        return lax.fori_loop(0, n, body, q0)

    jitted = functools.partial(jax.jit, static_argnums=0)(n_steps)
    return (lambda n, q: jitted(n, q, xs, mask)), q0


def time_n(fn, n, q0):
    out = fn(n, q0)
    np.asarray(out)  # completion barrier through the tunnel
    times = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(fn(n, q0))
        times.append(time.time() - t0)
    return min(times)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    out_path = os.path.join(REPO, "results", "kv_layout_probe.jsonl")
    shapes = [(256, 256), (128, 384), (64, 384)]  # headline shape first
    for B, T in shapes:
        for variant in ("per_head", "merged", "per_head_int8", "merged_int8"):
            fn, q0 = build(variant, B, T, jax.random.PRNGKey(0))
            t_lo = time_n(fn, N_LO, q0)
            t_hi = time_n(fn, N_HI, q0)
            ms = (t_hi - t_lo) / (N_HI - N_LO) * 1e3
            itemsize = 1 if "int8" in variant else 2
            gb = 2 * 12 * B * T * HD * itemsize / 1e9
            row = {"study": "kv_layout", "variant": variant, "B": B, "T": T,
                   "ms_per_step": round(ms, 4),
                   "eff_gbps_kv_read": round(gb / (ms / 1e3), 1),
                   "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
                   "n_lo": N_LO, "n_hi": N_HI}
            print(json.dumps(row))
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
