"""ONE-SESSION follow-up matrix: admission policy x mixed-pool kv auto.

The round-5 matrix (matrix_summary_r5) showed pure-int8 KV LOSES both
workloads same-session (0.74x plain, 0.87x bf16 on the 8%-long mix) —
the round-4 "+17.8%" int8 long-mix claim was session drift — and the
bf16 tiered server BEATS static on the mix (1.101x). Open questions it
could not answer:

1. admit_policy="sorted" (offline length-sorted cohorts): does cohort
   homogeneity close the plain-offline gap (0.859x static)?
2. MIXED pools (bf16 short + int8 long — the kv auto candidate): does
   quantizing only the LONG pool's cache help the mix, or does the
   bf16-everywhere result stand?

Arms (same process, same workload arrays):
  plain:   server bf16 fifo | server bf16 sorted | static
  longmix: server bf16 fifo | server bf16 sorted | server MIXED fifo | static

    python scripts/server_matrix2.py     # TPU
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.server_matrix import (LONG_FRAC, LONG_LEN, LONG_SLOTS,  # noqa: E402
                                   MAX_NEW, MAX_PROMPT, SLOTS, SMOKE, SYNC,
                                   emit, make_workload, run_static)

OUT_REQ = int(os.environ.get("SERVER_REQUESTS", 256))


def run_server(params, cfg, prompts, budgets, *, long_mix, label, policy,
               mixed):
    import jax
    from ergm_tpu.infer.server import ContinuousServer, Request
    cache_len = 1024 if long_mix else cfg.n_positions
    max_prompt = ((LONG_LEN + 63) // 64) * 64 if long_mix else MAX_PROMPT
    srv = ContinuousServer(
        params, cfg, slots=SLOTS, eos_id=50256, sp2_id=50258,
        max_prompt=max_prompt, prompt_bucket=64, sync_every=SYNC,
        cache_len=cache_len, cache_grow_step=32,
        long_slots=min(LONG_SLOTS, SLOTS // 2) if long_mix else 0,
        admit_policy=policy)
    if mixed:
        assert srv.gcfgs[-1].kv_cache_dtype == "int8", srv.gcfgs

    def one_pass():
        for p, b in zip(prompts, budgets):
            srv.submit(Request(prompt_ids=p, max_new_tokens=int(b),
                               greedy=True))
        t0 = time.time()
        res = srv.run_until_drained(max_iters=100_000)
        return time.time() - t0, res

    warm, _ = one_pass()
    srv.reset()
    wall, results = one_pass()
    got = sum(len(r.tokens) for r in results.values())
    emit({"config": label, "session": "matrix2_r5",
          "requests": len(prompts), "kv": cfg.kv_cache_dtype,
          "admit": policy, "mixed_pools": mixed,
          "wall_s": round(wall, 2), "utt_per_s": round(len(prompts) / wall, 1),
          "decode_tok_per_s": round(got / wall, 1),
          "warmup_s": round(warm, 1), "generated": got})
    del srv
    return len(prompts) / wall


def main():
    import jax
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        use_cross_attention=False, kv_cache_dtype="auto")
    if SMOKE:
        cfg = cfg.replace(n_layer=2, n_head=4, n_embd=64, dtype="float32")
    params = jax.device_put(gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))

    summary = {"config": "matrix2_summary_r5", "session": "matrix2_r5",
               "slots": SLOTS}
    for long_mix, wl in ((False, "plain"), (True, "longmix")):
        prompts, budgets, _ = make_workload(long_mix)
        suffix = (f"_long{LONG_FRAC:g}x{LONG_LEN}_tier{LONG_SLOTS}"
                  if long_mix else "")
        T = 1024 if long_mix else 256
        arms = [("fifo", False), ("sorted", False)]
        if long_mix:
            arms.append(("fifo", True))   # mixed pools need tiers
        for policy, mixed in arms:
            label = (f"server_S{SLOTS}_sync{SYNC}_T{T}{suffix}"
                     + (f"_admit-{policy}" if policy != "fifo" else "")
                     + ("_kvmixed" if mixed else "_kv-bf16"))
            key = f"{wl}_{policy}" + ("_mixed" if mixed else "")
            # mixed pools ride the "auto" config — the server resolves
            # auto+tiers per pool (bf16 short / int8 long); the pure
            # arms pin an explicit bf16 cache so no resolution happens
            acfg = cfg if mixed else cfg.replace(kv_cache_dtype="bf16")
            summary[key] = round(run_server(
                params, acfg, prompts, budgets, long_mix=long_mix,
                label=label, policy=policy, mixed=mixed), 1)
        summary[f"{wl}_static"] = round(run_static(
            params, cfg, prompts, budgets, long_mix=long_mix,
            label=f"static_B{SLOTS}{suffix}_m2"), 1)
    for wl in ("plain", "longmix"):
        st = summary[f"{wl}_static"]
        summary[f"{wl}_fifo_vs_static"] = round(summary[f"{wl}_fifo"] / st, 3)
        summary[f"{wl}_sorted_vs_static"] = round(
            summary[f"{wl}_sorted"] / st, 3)
    summary["longmix_mixed_vs_bf16"] = round(
        summary["longmix_fifo_mixed"] / summary["longmix_fifo"], 3)
    emit(summary)


if __name__ == "__main__":
    main()
