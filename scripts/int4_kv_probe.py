"""Probe: int4 self-attention KV cache + int8 cross cache, decode shapes.

The B=256 decode roofline (results/decode_roofline.jsonl) puts
self-attention AT its int8 read bound (~1.4 ms measured vs 1.56 ms
bound) — the remaining attention lever is fewer BYTES, not better
fusion. jnp.int4 is a native packed dtype on TPU; this probe measures
the model's exact short-cache attention formulation (dequantize the
slice, fused XLA attention) with an int4 cache vs the shipped int8, at
the headline shape, 12 stacked layers in a scan (differential-N timing
per scripts/kv_layout_probe.py). Also probes the int8 CROSS cache with
factored scales in the lane-grouped formulation (cross read is the
other above-bound component: ~0.8 ms vs 0.37 bound).

Appends to results/int4_kv_probe.jsonl.
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

H, D, L = 12, 64, 12
HD = H * D
N_LO = int(os.environ.get("PROBE_N_LO", 8))
N_HI = int(os.environ.get("PROBE_N_HI", 40))
REPS = int(os.environ.get("PROBE_REPS", 3))


def dequant_attn_step(q, K, V, ks, vs, mask, scale):
    """The model's T<512 int8 path: dequantize the slice, fused
    attention (models/gpt2.py _self_attention_cached)."""
    k = K.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16)
    v = V.astype(jnp.bfloat16) * vs.astype(jnp.bfloat16)
    B = q.shape[0]
    qh = q.reshape(B, H, 1, D)
    s = jnp.einsum("bhqd,bhtd->bhqt", qh, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + mask[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqt,bhtd->bhqd", p.astype(k.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, HD).astype(q.dtype)


def cross_int8_factored_step(q, ck, cv, ks, vs, mask, scale):
    """Lane-grouped cross decode over an int8 merged cache with
    per-(token, head) scales factored OUT of both reductions."""
    B, Lc = ck.shape[0], ck.shape[1]
    prod = ck.astype(jnp.float32) * q.astype(jnp.float32)[:, None, :]
    s = prod.reshape(B, Lc, H, D).sum(-1) * ks.astype(jnp.float32) * scale
    s = s + mask[:, :, None]
    pr = jax.nn.softmax(s, axis=1)
    w = (pr * vs.astype(jnp.float32))[:, :, :, None]
    w = jnp.broadcast_to(w, (B, Lc, H, D)).reshape(B, Lc, HD)
    out = (cv.astype(jnp.float32) * w).sum(axis=1)
    return out.astype(q.dtype)


def cross_bf16_step(q, ck, cv, mask, scale):
    """The shipped lane-grouped bf16 cross decode (baseline)."""
    B, Lc = ck.shape[0], ck.shape[1]
    prod = ck.astype(jnp.float32) * q.astype(jnp.float32)[:, None, :]
    s = prod.reshape(B, Lc, H, D).sum(-1) * scale
    s = s + mask[:, :, None]
    pr = jax.nn.softmax(s, axis=1)
    w = jnp.broadcast_to(pr[:, :, :, None], (B, Lc, H, D)).reshape(B, Lc, HD)
    out = (cv.astype(jnp.float32) * w).sum(axis=1)
    return out.astype(q.dtype)


def build(variant, B, T, key):
    scale = 1.0 / D ** 0.5

    def setup(key):
        ks6 = jax.random.split(key, 6)
        filled = (3 * T) // 4
        mask = jnp.where(jnp.arange(T)[None, :] < filled, 0.0, -1e9)
        mask = jnp.broadcast_to(mask, (B, T)).astype(jnp.float32)
        q0 = jax.random.normal(ks6[0], (B, HD), jnp.bfloat16)
        if variant in ("kv_int8", "kv_int4"):
            dt = jnp.int8 if variant == "kv_int8" else jnp.int4
            lim = 127 if variant == "kv_int8" else 7
            K = jax.random.randint(ks6[1], (L, B, H, T, D), -lim, lim, dt)
            V = jax.random.randint(ks6[2], (L, B, H, T, D), -lim, lim, dt)
            ksc = jax.random.uniform(ks6[3], (L, B, H, T, 1), jnp.float32, 0.01, 0.02)
            vsc = jax.random.uniform(ks6[4], (L, B, H, T, 1), jnp.float32, 0.01, 0.02)
            return q0, (K, V, ksc, vsc), mask
        Lc = 32
        cmask = jnp.zeros((B, Lc), jnp.float32)
        if variant == "cross_bf16":
            ck = jax.random.normal(ks6[1], (L, B, Lc, HD), jnp.bfloat16)
            cv = jax.random.normal(ks6[2], (L, B, Lc, HD), jnp.bfloat16)
            return q0, (ck, cv), cmask
        if variant == "cross_int8":
            ck = jax.random.randint(ks6[1], (L, B, Lc, HD), -127, 127, jnp.int8)
            cv = jax.random.randint(ks6[2], (L, B, Lc, HD), -127, 127, jnp.int8)
            ksc = jax.random.uniform(ks6[3], (L, B, Lc, H), jnp.float32, 0.01, 0.02)
            vsc = jax.random.uniform(ks6[4], (L, B, Lc, H), jnp.float32, 0.01, 0.02)
            return q0, (ck, cv, ksc, vsc), cmask
        raise ValueError(variant)

    q0, xs, mask = jax.jit(setup)(key)
    if variant in ("kv_int8", "kv_int4"):
        step = lambda q, x, m: (dequant_attn_step(q, *x, m, scale), None)
    elif variant == "cross_bf16":
        step = lambda q, x, m: (cross_bf16_step(q, *x, m, scale), None)
    else:
        step = lambda q, x, m: (cross_int8_factored_step(q, *x, m, scale), None)

    def n_steps(n, q0, xs, mask):
        def body(_, q):
            q, _n = lax.scan(lambda q, x: step(q, x, mask), q, xs)
            return q
        return lax.fori_loop(0, n, body, q0)

    jitted = functools.partial(jax.jit, static_argnums=0)(n_steps)
    return (lambda n, q: jitted(n, q, xs, mask)), q0


def time_n(fn, n, q0):
    np.asarray(fn(n, q0))
    times = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(fn(n, q0))
        times.append(time.time() - t0)
    return min(times)


def main():
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    out_path = os.path.join(REPO, "results", "int4_kv_probe.jsonl")
    B, T = 256, 256
    for variant in ("kv_int8", "kv_int4", "cross_bf16", "cross_int8"):
        try:
            fn, q0 = build(variant, B, T, jax.random.PRNGKey(0))
            t_lo = time_n(fn, N_LO, q0)
            t_hi = time_n(fn, N_HI, q0)
        except Exception as e:
            row = {"study": "int4_kv", "variant": variant, "B": B, "T": T,
                   "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(row))
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            continue
        ms = (t_hi - t_lo) / (N_HI - N_LO) * 1e3
        sz = {"kv_int8": 1.0, "kv_int4": 0.5, "cross_bf16": 2.0,
              "cross_int8": 1.0}[variant]
        tl = T if variant.startswith("kv") else 32
        gb = 2 * L * B * tl * HD * sz / 1e9
        row = {"study": "int4_kv", "variant": variant, "B": B, "T": T,
               "ms_per_step": round(ms, 4),
               "eff_gbps_cache_read": round(gb / (ms / 1e3), 1),
               "n_lo": N_LO, "n_hi": N_HI}
        print(json.dumps(row))
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
