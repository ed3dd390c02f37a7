"""Probe the headline generate program's optimized HLO for cache
relayout copies (VERDICT r4 next #2c).

The round-4 device trace showed the int8 KV cache pinned to layout
{1,4,2,3,0} by one internal while loop and {1,4,3,2,0} by another, with
~4 x 1.15 ms whole-cache copy ops per invocation converting between
them. This script compiles the exact bench program, greps the optimized
HLO for copy/transpose ops on the big cache shapes, and reports their
operand/result layouts — the evidence for where to pin a layout (or
restructure) to delete the copies.

Usage: python scripts/layout_probe.py  (TPU; ~2 min with warm cache)
"""
from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("BENCH_BATCH", 256))
PROMPT_LEN = 128
NEW_TOKENS = 128


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
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(gpt2.params_for_inference(params, cfg))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (BATCH, PROMPT_LEN)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (BATCH, PROMPT_LEN)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((BATCH, 768)), jnp.bfloat16)
    auds = jnp.asarray(rng.standard_normal((BATCH, 768)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 50000, (BATCH, 32)), jnp.int32)
    total = PROMPT_LEN + NEW_TOKENS

    def run(params, ids, tts, imgs, auds, caps, key):
        return generate(
            params, cfg, ids, PROMPT_LEN, max_len=total, eos_id=50256,
            sp2_id=50258, top_p=0.8, rng=key, token_type_ids=tts,
            imgs=imgs, auds=auds, caption_ids=caps)

    lowered = jax.jit(run).lower(params, ids, tts, imgs, auds, caps,
                                 jax.random.PRNGKey(0))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines", file=sys.stderr)

    # find copy/transpose ops whose result is a big (>= 4 MB) buffer
    pat = re.compile(r"%?([\w.\-]+) = (\S+) (copy|transpose|bitcast-convert)"
                     r"\(([^)]*)\)")
    def nbytes(shape: str) -> int:
        m = re.match(r"(s8|s32|f32|bf16|u8|s4|pred)\[([\d,]*)\]", shape)
        if not m:
            return 0
        sizes = {"s8": 1, "u8": 1, "s4": 1, "pred": 1, "bf16": 2,
                 "f32": 4, "s32": 4}
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = sizes[m.group(1)]
        for d in dims:
            n *= d
        return n

    found = []
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m or m.group(3) != "copy":
            continue
        res_shape = m.group(2)
        if nbytes(res_shape) >= 4 * 1024 * 1024:
            found.append({"result": res_shape,
                          "mb": round(nbytes(res_shape) / 1e6, 1),
                          "line": line.strip()[:300]})
    print(json.dumps({"big_copies": len(found)}, indent=None))
    for f in found:
        print(f["mb"], "MB:", f["line"])

    # also: the layouts each while loop pins on s8 cache-shaped operands
    for m in re.finditer(r"(s8\[12,\d+,12,\d+,64\]\{[\d,]+\})", hlo):
        pass
    layouts = {}
    for m in re.finditer(r"s8\[12,\d+,12,\d+,64\]\{([\d,]+)", hlo):
        layouts[m.group(1)] = layouts.get(m.group(1), 0) + 1
    print("cache layout occurrence counts:", layouts)


if __name__ == "__main__":
    main()
