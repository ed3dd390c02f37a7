"""Same-process interleaved A/B of a kernel env gate.

bench.py runs are separate sessions; same-day baseline runs drifted
0.521 -> 0.541 s/invocation, swamping kernel deltas. Here BOTH
programs — gate off and gate on (AB_VAR flipped between jit traces,
same process) — compile once, then invocations interleave ABABAB, so
drift hits both arms equally.

    AB_VAR=ERGM_CROSS_KERNEL python scripts/cross_ab.py
    AB_VAR=ERGM_PREFILL_KERNEL python scripts/cross_ab.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "cross_kernel_bench.jsonl")
B, PROMPT, NEW = 256, 128, 128
VAR = os.environ.get("AB_VAR", "ERGM_CROSS_KERNEL")
ROUNDS = int(os.environ.get("AB_ROUNDS", 4))
CHAIN = int(os.environ.get("AB_CHAIN", 3))


def main():
    import jax
    import jax.numpy as jnp
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.generate import generate
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        kv_cache_dtype="int8", weight_dtype="int8_lm_head",
        cross_kv_dtype="int8")
    params = jax.device_put(gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (B, PROMPT)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (B, PROMPT)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
    auds = jnp.asarray(rng.standard_normal((B, 768)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 50000, (B, 32)), jnp.int32)

    def make(kernel_on):
        os.environ[VAR] = "1" if kernel_on else "0"
        try:
            fn = jax.jit(lambda p, key: generate(
                p, cfg, ids, PROMPT, max_len=PROMPT + NEW, eos_id=50256,
                sp2_id=50258, top_p=0.8, rng=key, token_type_ids=tts,
                imgs=imgs, auds=auds, caption_ids=caps))
            out = fn(params, jax.random.PRNGKey(0))     # trace+compile NOW
            np.asarray(out.lengths)
        finally:
            del os.environ[VAR]
        return fn

    t0 = time.time(); off = make(False); print(f"off compiled {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time(); on = make(True); print(f"on compiled {time.time()-t0:.0f}s", file=sys.stderr)

    walls = {"off": [], "on": []}
    for r in range(ROUNDS):
        for name, fn in (("off", off), ("on", on)):
            t0 = time.time()
            outs = [fn(params, jax.random.PRNGKey(r * 31 + c))
                    for c in range(CHAIN)]
            for o in outs:
                np.asarray(o.lengths)
            walls[name].append((time.time() - t0) / CHAIN)
    row = {"study": "cross_ab", "var": VAR, "B": B, "prompt": PROMPT, "new": NEW,
           "config": "int8 kv+cross, int8_lm_head, top-p (headline)",
           "off_s": [round(w, 4) for w in walls["off"]],
           "on_s": [round(w, 4) for w in walls["on"]],
           "off_best_s": round(min(walls["off"]), 4),
           "on_best_s": round(min(walls["on"]), 4),
           "on_vs_off": round(min(walls["off"]) / min(walls["on"]), 4),
           "utt_off": round(B / min(walls["off"]), 1),
           "utt_on": round(B / min(walls["on"]), 1)}
    print(json.dumps(row))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
