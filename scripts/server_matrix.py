"""ONE-SESSION serving matrix (VERDICT r4 next #3).

Round 3/4 long-mix serving claims compared arms across sessions — the
drift README's own methodology forbids (static arms drifted 36.2 → 43.9
across sessions). This script measures EVERY arm in ONE process on one
chip, same workload arrays, back to back:

  workloads: plain offline (prompts<=128)  |  8%-long x 896 mix (tier8)
  arms:      server bf16 | server int8 | server int4 | static bf16

and emits per-arm rows plus a same-session summary with every ratio the
docs quote. int4 KV in the server is new this round (staged block
decode; tests/test_server.py::test_int4_kv_server_matches_generate).

    python scripts/server_matrix.py          # on the TPU, ~30 min
    SERVER_SMOKE=1 python scripts/server_matrix.py   # CPU sanity

Appends JSON lines to results/server_bench.jsonl (the canonical log).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "server_bench.jsonl")
SLOTS = int(os.environ.get("SERVER_SLOTS", 64))
REQUESTS = int(os.environ.get("SERVER_REQUESTS", 256))
MAX_PROMPT = 128
MIN_NEW, MAX_NEW = 16, 128
SYNC = 32
LONG_LEN, LONG_FRAC, LONG_SLOTS = 896, 0.08, 8
SMOKE = os.environ.get("SERVER_SMOKE", "0") not in ("0", "false")


def emit(row):
    print(json.dumps(row), flush=True)
    if SMOKE:
        return  # smoke rows never pollute the canonical log
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def make_workload(long_mix: bool):
    rng = np.random.default_rng(0)  # identical arrays for every arm
    prompts = [rng.integers(0, 50000, (int(n),)).tolist()
               for n in rng.integers(32, MAX_PROMPT + 1, (REQUESTS,))]
    long_idx = set()
    if long_mix:
        long_idx = {int(i) for i in rng.choice(
            REQUESTS, int(round(REQUESTS * LONG_FRAC)), replace=False)}
        for i in long_idx:
            prompts[i] = rng.integers(0, 50000, (LONG_LEN,)).tolist()
    budgets = rng.integers(MIN_NEW, MAX_NEW + 1, (REQUESTS,)).tolist()
    return prompts, budgets, long_idx


def run_server(params, cfg, prompts, budgets, *, long_mix, label):
    import jax
    from ergm_tpu.infer.server import ContinuousServer, Request
    cache_len = 1024 if long_mix else cfg.n_positions
    max_prompt = ((LONG_LEN + 63) // 64) * 64 if long_mix else MAX_PROMPT
    srv = ContinuousServer(
        params, cfg, slots=SLOTS, eos_id=50256, sp2_id=50258,
        max_prompt=max_prompt, prompt_bucket=64, sync_every=SYNC,
        cache_len=cache_len, cache_grow_step=32,
        long_slots=min(LONG_SLOTS, SLOTS // 2) if long_mix else 0)

    def one_pass():
        for p, b in zip(prompts, budgets):
            srv.submit(Request(prompt_ids=p, max_new_tokens=int(b),
                               greedy=True))
        t0 = time.time()
        res = srv.run_until_drained(max_iters=100_000)
        return time.time() - t0, res

    warm, _ = one_pass()           # compiles
    srv.reset()
    wall, results = one_pass()     # steady state
    got = sum(len(r.tokens) for r in results.values())
    lats = sorted(r.latency_s for r in results.values())
    emit({"config": label, "session": "matrix_r5", "requests": REQUESTS,
          "kv": cfg.kv_cache_dtype, "wall_s": round(wall, 2),
          "utt_per_s": round(REQUESTS / wall, 1),
          "decode_tok_per_s": round(got / wall, 1),
          "warmup_s": round(warm, 1),
          "latency_p50_s": round(float(np.percentile(lats, 50)), 2),
          "latency_p90_s": round(float(np.percentile(lats, 90)), 2),
          "generated": got})
    del srv
    return REQUESTS / wall


def run_static(params, cfg, prompts, budgets, *, long_mix, label):
    import jax
    from ergm_tpu.infer.generate import generate_batch
    max_len = 1024 if long_mix else cfg.n_positions
    generate_batch(params, cfg, prompts[:SLOTS], max_len=max_len,
                   eos_id=50256, sp2_id=50258, greedy=True,
                   max_new_tokens=MAX_NEW, rng=jax.random.PRNGKey(0))
    t0 = time.time()
    done = 0
    for i in range(0, REQUESTS, SLOTS):
        outs, _ = generate_batch(
            params, cfg, prompts[i:i + SLOTS], max_len=max_len,
            eos_id=50256, sp2_id=50258, greedy=True,
            max_new_tokens=MAX_NEW, rng=jax.random.PRNGKey(0))
        done += sum(min(len(o), b)
                    for o, b in zip(outs, budgets[i:i + SLOTS]))
    wall = time.time() - t0
    emit({"config": label, "session": "matrix_r5", "requests": REQUESTS,
          "kv": cfg.kv_cache_dtype, "wall_s": round(wall, 2),
          "utt_per_s": round(REQUESTS / wall, 1),
          "decode_tok_per_s": round(done / wall, 1), "generated": done})
    return REQUESTS / wall


def main():
    import jax
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    def build(kv):
        cfg = ModelConfig.from_model_type(
            "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
            use_cross_attention=False, kv_cache_dtype=kv)
        if SMOKE:
            cfg = cfg.replace(n_layer=2, n_head=4, n_embd=64,
                              dtype="float32")
        params = jax.device_put(gpt2.params_for_inference(
            gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))
        return cfg, params

    summary = {"config": "matrix_summary_r5", "session": "matrix_r5",
               "slots": SLOTS, "requests": REQUESTS,
               "mix": f"plain & long{LONG_FRAC:g}x{LONG_LEN}_tier{LONG_SLOTS}"}
    for long_mix, wl in ((False, "plain"), (True, "longmix")):
        prompts, budgets, _ = make_workload(long_mix)
        suffix = (f"_long{LONG_FRAC:g}x{LONG_LEN}_tier{LONG_SLOTS}"
                  if long_mix else "")
        T = 1024 if long_mix else 256
        for kv in ("auto", "int8", "int4"):
            cfg, params = build(kv)
            label = f"server_S{SLOTS}_sync{SYNC}_T{T}{suffix}_kv-{kv}"
            summary[f"{wl}_server_{kv}"] = round(run_server(
                params, cfg, prompts, budgets, long_mix=long_mix,
                label=label), 1)
            del params
        cfg, params = build("auto")
        summary[f"{wl}_static_bf16"] = round(run_static(
            params, cfg, prompts, budgets, long_mix=long_mix,
            label=f"static_B{SLOTS}{suffix}"), 1)
        del params
    for wl in ("plain", "longmix"):
        st = summary[f"{wl}_static_bf16"]
        for kv in ("auto", "int8", "int4"):
            summary[f"{wl}_{kv}_vs_static"] = round(
                summary[f"{wl}_server_{kv}"] / st, 3)
    b = summary["longmix_server_auto"]
    summary["longmix_int8_vs_bf16"] = round(
        summary["longmix_server_int8"] / b, 3)
    summary["longmix_int4_vs_bf16"] = round(
        summary["longmix_server_int4"] / b, 3)
    emit(summary)


if __name__ == "__main__":
    main()
