"""Prefill-interference benchmark (run on the TPU).

Measures the decode-latency hiccup a LONG prompt's admission injects
into concurrent short streams: N-1 slots decode steadily while one
long-prompt request arrives mid-run. Reports the per-block step-time
distribution for the steady streams and the spike at admission, with
and without chunked prefill.

    python scripts/prefill_interference_bench.py
    PI_CHUNKS=0,128,256 PI_LONG=896 python scripts/prefill_interference_bench.py

Appends JSON lines to results/prefill_interference.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "prefill_interference.jsonl")
MODEL = os.environ.get("PI_MODEL", "gpt2")
SLOTS = int(os.environ.get("PI_SLOTS", 8))
LONG = int(os.environ.get("PI_LONG", 896))      # interfering prompt length
SHORT = int(os.environ.get("PI_SHORT", 32))     # steady streams' prompt
NEW = int(os.environ.get("PI_NEW", 256))        # steady streams' budget
SYNC = int(os.environ.get("PI_SYNC", 8))
CHUNKS = [int(x) for x in os.environ.get("PI_CHUNKS", "0,128,256").split(",")]


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def run_arm(params, cfg, chunk):
    import jax

    from ergm_tpu.infer.server import ContinuousServer, Request

    kw = dict(slots=SLOTS, eos_id=50256, sp2_id=50258,
              max_prompt=max(LONG, 128) if chunk == 0 else max(chunk, 128),
              cache_len=cfg.n_positions, prompt_bucket=64, sync_every=SYNC,
              cache_grow_step=0)
    if chunk:
        kw["prefill_chunk"] = chunk
    srv = ContinuousServer(params, cfg, **kw)

    def drive():
        srv.reset()
        r = np.random.default_rng(0)
        for _ in range(SLOTS - 1):
            srv.submit(Request(
                prompt_ids=r.integers(0, 50000, (SHORT,)).tolist(),
                max_new_tokens=NEW, greedy=True))
        # steady-state warm: let the streams run a few blocks first
        steps = []
        long_submitted_at = None
        i = 0
        while (srv.queue or any(s.active or getattr(s, "prefilling", False)
                                for s in srv.slots)):
            if i == 6:  # mid-run: the long prompt arrives
                srv.submit(Request(
                    prompt_ids=r.integers(0, 50000, (LONG,)).tolist(),
                    max_new_tokens=16, greedy=True))
                long_submitted_at = i
            t0 = time.time()
            srv.step()
            steps.append(time.time() - t0)
            i += 1
        return steps, long_submitted_at

    drive()  # compile warmup (all programs incl. the admission path)
    steps, sub_at = drive()
    st = np.asarray(steps) * 1e3
    # admission neighborhood: the blocks the long prompt's admission can
    # touch (one per chunk, or the single-shot prefill block + slack)
    width = max(3, (LONG + chunk - 1) // chunk + 1) if chunk else 3
    spike = float(st[sub_at:sub_at + width].max())
    # steady blocks = all except the admission neighborhood (width-scaled:
    # a fixed window under-excludes when LONG/chunk > window and would
    # contaminate the steady percentiles with chunk-interference blocks)
    steady = np.concatenate([st[2:sub_at], st[sub_at + width + 2:]])
    return {"chunk": chunk, "blocks": len(steps),
            "steady_p50_ms": round(float(np.percentile(steady, 50)), 2),
            "steady_p90_ms": round(float(np.percentile(steady, 90)), 2),
            "max_block_ms": round(float(st.max()), 2),
            "admit_spike_ms": round(spike, 2),
            "total_s": round(float(st.sum() / 1e3), 3)}


def main():
    import jax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = ModelConfig.from_model_type(
        MODEL, vocab_size=50271, dtype="bfloat16", modality_dim=768,
        use_cross_attention=False)
    params = jax.device_put(gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))

    for chunk in CHUNKS:
        row = run_arm(params, cfg, chunk)
        row.update({"model": MODEL, "slots": SLOTS, "long": LONG,
                    "short": SHORT, "new": NEW, "sync_every": SYNC})
        emit(row)


if __name__ == "__main__":
    main()
