"""Prefill-only ablation for the B=256 headline (VERDICT r4 follow-on).

The decode roofline (results/decode_roofline.jsonl) pinned the headline
invocation's prefill at 93-104 ms vs a ~33.6 ms MXU bound — the largest
single above-bound component. This times JUST the prefill program
(prompt forward writing the KV cache, logits at the last position)
under config ablations to attribute the 3x:

  full        headline config (int8 KV, int8 cross, captions, tri-modal)
  kv_bf16     bf16 KV cache (no per-token quantize+write of K/V)
  no_cross    captions off (no encoder pass, no cross-attn sublayers)
  attn_xla    XLA attention instead of the Pallas prefix-prefill kernel
  no_inject   no audio/visual embedding injection
  logits_full logits at every position (vs 'last')

Each variant reports steady-state ms over REPS after a warmup call.
Run on the TPU chip; appends one JSON row to results/prefill_probe.jsonl.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PP_BATCH", 256))
L = int(os.environ.get("PP_PROMPT", 128))
T = int(os.environ.get("PP_CACHE", 256))
REPS = int(os.environ.get("PP_REPS", 8))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "prefill_probe.jsonl")


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (B, L)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (B, L)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
    auds = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 50000, (B, 32)), jnp.int32)

    def build(name, **over):
        caption = over.pop("captions", True)
        inject = over.pop("inject", True)
        logits_mode = over.pop("compute_logits", "last")
        cfg = ModelConfig.from_model_type(
            "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
            kv_cache_dtype=over.pop("kv", "int8"),
            cross_kv_dtype=over.pop("cross", "int8"),
            attention_impl=over.pop("attn", "auto"))
        params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
        params = jax.device_put(gpt2.params_for_inference(params, cfg))

        @jax.jit
        def prefill(params, ids, tts, imgs, auds, caps):
            cache = gpt2.init_kv_cache(cfg, B, T,
                                       caption_len=32 if caption else 0)
            out = gpt2.forward(
                params, cfg, ids, token_type_ids=tts,
                imgs=imgs if inject else None,
                auds=auds if inject else None,
                caption_ids=caps if caption else None,
                cache=cache, prefix_prefill=True,
                compute_logits=logits_mode)
            # scalar summaries force the whole program (block_until_ready
            # is unreliable through the tunneled transport — the repo-wide
            # convention is an np.asarray fetch of a data-dependent value)
            return (out.logits.astype(jnp.float32).sum(),
                    out.cache.k.astype(jnp.float32).sum())

        args = (params, ids, tts, imgs, auds, caps)
        t0 = time.time()
        np.asarray(prefill(*args)[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            np.asarray(prefill(*args)[0])
            times.append(time.time() - t0)
        ms = sorted(times)[len(times) // 2] * 1e3
        print(f"{name:12s} {ms:7.1f} ms (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return round(ms, 1)

    # tunnel round-trip baseline: a trivial jitted op, fetched the same
    # way — subtract rt_ms from every variant for device-only time
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0.0)))
    rts = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(tiny(jnp.float32(1.0)))
        rts.append(time.time() - t0)
    rt_ms = sorted(rts)[len(rts) // 2] * 1e3

    row = {"study": "prefill_probe", "B": B, "L": L, "cache_T": T,
           "reps": REPS, "rt_ms": round(rt_ms, 1)}
    row["full_ms"] = build("full")
    row["kv_bf16_ms"] = build("kv_bf16", kv="auto")
    row["no_cross_ms"] = build("no_cross", captions=False, cross="auto")
    row["attn_xla_ms"] = build("attn_xla", attn="xla")
    row["no_inject_ms"] = build("no_inject", inject=False)
    row["logits_full_ms"] = build("logits_full", compute_logits=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
