"""Ablation microbenchmark for the decode hot loop (run on the TPU).

Times a 128-step KV-cached decode loop (the bench configuration:
B=128, prompt=128, gpt2, caption cross-attention) under targeted
ablations so the per-step cost decomposes:

  full    - real loop: forward + lm_head + top-p sampling
  greedy  - argmax instead of top-p               -> sampler cost
  fixed   - compute_logits=False, constant token  -> lm_head+sampler cost
  noattn  - attention output replaced by q        -> cache-read/attn cost
            (cache writes/quantize still run; reads are DCE'd)
  nocross - no caption ids                        -> cross-attention cost

each for kv_cache_dtype in {auto(bf16), int8}. Appends one JSON line per
variant to results/decode_ablation.jsonl as it goes (the TPU tunnel makes
long runs fragile; partial results must survive).

Usage: python scripts/decode_ablation.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("AB_BATCH", 128))
PROMPT = int(os.environ.get("AB_PROMPT", 128))
NEW = int(os.environ.get("AB_NEW", 128))
REPS = int(os.environ.get("AB_REPS", 2))
# chain n invocations per timed fetch: the axon tunnel has a large fixed
# per-fetch overhead (~300 ms), so single-invocation wall times massively
# overstate device time; chained runs amortize it
CHAIN = int(os.environ.get("AB_CHAIN", 1))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "decode_ablation.jsonl")

VARIANTS = [
    "int8-full", "int8-greedy", "int8-fixed", "int8-noattn", "int8-nocross",
    "bf16-full", "bf16-fixed", "bf16-noattn",
]

# sampler ablations: samplelse = exact top-k on raw logits with a
# logsumexp normalizer (no materialized full softmax); approx = TPU
# approx_max_k instead of exact top_k; bf16k = top_k over bf16 logits
SAMPLER_VARIANTS = ["int8-samplelse", "int8-approx", "int8-bf16k"]


def _sampler(mode):
    import jax
    import jax.numpy as jnp

    def sample(logits, key, top_p=0.8, k=64):
        logits = logits.astype(jnp.float32)
        if mode == "approx":
            lvals, idx = jax.lax.approx_max_k(logits, k, recall_target=0.95)
        elif mode == "bf16k":
            lvals, idx = jax.lax.top_k(logits.astype(jnp.bfloat16), k)
            lvals = jnp.take_along_axis(logits, idx, axis=-1)
        else:
            lvals, idx = jax.lax.top_k(logits, k)
        # true probabilities via the full-vocab normalizer: one fused
        # reduction instead of a materialized [B, V] softmax
        logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        vals = jnp.exp(lvals - logz)
        cumsum = jnp.cumsum(vals, axis=-1)
        remove = cumsum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        kept = jnp.where(remove, 0.0, vals)
        choice = jax.random.categorical(
            key, jnp.log(jnp.maximum(kept, 1e-20)), axis=-1)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0]

    return sample


def run_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.generate import sample_top_p
    from ergm_tpu.models import gpt2

    kv, mode = name.split("-")
    # trunk attribution (round 4): a trailing digit runs the variant at
    # that many layers — per-layer trunk cost and the layer-independent
    # fixed cost separate by linear fit (e.g. int8-noattn6 vs
    # int8-noattn's 12 layers)
    n_layer = 12
    if mode and mode[-1].isdigit():
        n_layer = int(mode[-1])
        mode = mode[:-1]
    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        n_layer=n_layer,
        kv_cache_dtype=kv if kv in ("int8", "int4") else "auto",
        # AB_CROSS=int8: factored-scale int8 cross cache (round 4)
        cross_kv_dtype=os.environ.get("AB_CROSS", "auto"),
        # AB_WEIGHT=int8: weight-only quantized serving (kernel_q path)
        weight_dtype=os.environ.get("AB_WEIGHT", "auto"),
        decode_scan_unroll=int(os.environ.get("AB_UNROLL", 1)))
    alt_sampler = (_sampler(mode.replace("sample", ""))
                   if mode in ("samplelse", "approx", "bf16k") else None)

    real_mha = gpt2.multihead_attention
    real_mlp = gpt2._mlp
    if mode == "noattn":
        gpt2.multihead_attention = lambda q, k, v, **kw: q
    if mode == "nomlp":
        gpt2._mlp = lambda h, p, **kw: jnp.zeros_like(h)
    try:
        params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
        if cfg.weight_dtype == "int8":
            params = gpt2.params_for_inference(params, cfg)
        params = jax.device_put(params)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 50000, (B, PROMPT)), jnp.int32)
        caps = (None if mode == "nocross"
                else jnp.asarray(rng.integers(0, 50000, (B, 32)), jnp.int32))
        imgs = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
        auds = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
        total = PROMPT + NEW
        fixed_mode = mode == "fixed"

        def decode(params, ids, key):
            cache = gpt2.init_kv_cache(
                cfg, B, total, caption_len=0 if caps is None else caps.shape[1])
            mask = jnp.zeros((B, total), jnp.float32)
            mask = lax.dynamic_update_slice(
                mask, jnp.ones((B, PROMPT), jnp.float32), (0, 0))
            out = gpt2.forward(params, cfg, ids, attention_mask=mask,
                               imgs=imgs, auds=auds, caption_ids=caps,
                               cache=cache, prefix_prefill=True,
                               # mirrors infer/generate.py: prefill
                               # samples only the final position
                               compute_logits="last" if not fixed_mode else False)
            last = (jnp.full((B, 1), 123, jnp.int32) if fixed_mode
                    else jnp.argmax(out.logits[:, -1, :], -1)[:, None].astype(jnp.int32))

            def body(i, st):
                cache, mask, last, key = st
                cur = PROMPT + i
                mask = lax.dynamic_update_slice(
                    mask, jnp.ones((B, 1), jnp.float32), (0, cur))
                pos = jnp.full((B, 1), 0, jnp.int32) + cur
                o = gpt2.forward(params, cfg, last, position_ids=pos,
                                 attention_mask=mask, cache=cache,
                                 compute_logits=not fixed_mode)
                key, sub = jax.random.split(key)
                if fixed_mode:
                    nxt = last[:, 0]
                else:
                    logits = o.logits[:, -1, :]
                    if mode == "greedy":
                        nxt = jnp.argmax(logits, -1)
                    elif alt_sampler is not None:
                        nxt = alt_sampler(logits, sub)
                    else:
                        nxt = sample_top_p(logits, sub, 0.8)
                return (o.cache, mask, nxt[:, None].astype(jnp.int32), key)

            st = (out.cache, mask, last, jax.random.PRNGKey(0))
            st = lax.fori_loop(0, NEW, body, st)
            # anchor the output to the final cache so no variant's loop
            # body can be dead-code-eliminated (the "fixed" token itself
            # carries no data dependency on the forward)
            return st[2], jnp.sum(st[0].k.astype(jnp.float32))

        fn = jax.jit(decode)
        t0 = time.time()
        np.asarray(fn(params, ids, jax.random.PRNGKey(0))[1])
        compile_s = time.time() - t0
        times = []
        for r in range(REPS):
            t0 = time.time()
            outs = [fn(params, ids, jax.random.PRNGKey(r * CHAIN + c + 1))
                    for c in range(CHAIN)]
            for o in outs:  # device executions serialize; fetch all at the end
                np.asarray(o[1])
            times.append((time.time() - t0) / CHAIN)
        best = min(times)
        return {"variant": name, "chain": CHAIN, "n_layer": cfg.n_layer,
                "unroll": cfg.decode_scan_unroll,
                "cross": cfg.cross_kv_dtype,
                "weight": cfg.weight_dtype, "B": B,
                "best_s": round(best, 4),
                "tok_per_s": round(B * NEW / best, 1),
                "step_ms": round(best / NEW * 1e3, 4),
                "compile_s": round(compile_s, 1),
                "times": [round(t, 4) for t in times]}
    finally:
        gpt2.multihead_attention = real_mha
        gpt2._mlp = real_mlp


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    names = sys.argv[1:] or VARIANTS
    for name in names:
        res = run_variant(name)
        print(json.dumps(res), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
