"""ONE-SESSION online A/B: admit_policy fifo vs sorted under Poisson
arrivals. The sorted policy won offline (+22%/+33%, matrix2_summary_r5)
but re-sorts the live queue every admission pass — the starvation
question is empirical: at a sustainable arrival rate the queue stays
shallow (sorting is a no-op); at saturation it deepens and sorting
favors large budgets. Measures p50/p90/max latency for both policies at
RATE req/s, same arrival schedule, same process.

    SERVER_RATE=40 python scripts/online_admit_ab.py      # TPU
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
RATE = float(os.environ.get("SERVER_RATE", 40))
MAX_PROMPT, MIN_NEW, MAX_NEW, SYNC = 128, 16, 128, 32
SMOKE = os.environ.get("SERVER_SMOKE", "0") not in ("0", "false")


def main():
    import jax
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.server import ContinuousServer, Request
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        use_cross_attention=False, kv_cache_dtype="auto")
    if SMOKE:
        cfg = cfg.replace(n_layer=2, n_head=4, n_embd=64, dtype="float32")
    params = jax.device_put(gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 50000, (int(n),)).tolist()
               for n in rng.integers(32, MAX_PROMPT + 1, (REQUESTS,))]
    budgets = rng.integers(MIN_NEW, MAX_NEW + 1, (REQUESTS,)).tolist()
    arrivals = np.cumsum(np.random.default_rng(7)
                         .exponential(1.0 / RATE, (REQUESTS,)))

    summary = {"config": f"online_admit_ab_rate{RATE:g}",
               "session": "online_ab_r5", "slots": SLOTS,
               "requests": REQUESTS}
    for policy in ("fifo", "sorted"):
        srv = ContinuousServer(
            params, cfg, slots=SLOTS, eos_id=50256, sp2_id=50258,
            max_prompt=MAX_PROMPT, prompt_bucket=64, sync_every=SYNC,
            cache_len=cfg.n_positions, cache_grow_step=32,
            admit_policy=policy)

        def serve():
            srv.reset()
            t0 = time.time()
            nxt = 0
            while len(srv.results) < REQUESTS:
                now = time.time() - t0
                while nxt < REQUESTS and arrivals[nxt] <= now:
                    srv.submit(Request(prompt_ids=prompts[nxt],
                                       max_new_tokens=int(budgets[nxt]),
                                       greedy=True))
                    nxt += 1
                if not srv.busy():
                    time.sleep(0.002)
                    continue
                srv.step()
            return time.time() - t0

        serve()              # warmup (compiles + online-shaped groups)
        wall = serve()
        lats = sorted(r.latency_s for r in srv.results.values())
        row = {"config": f"online_server_S{SLOTS}_rate{RATE:g}"
                         f"_admit-{policy}",
               "session": "online_ab_r5", "wall_s": round(wall, 2),
               "latency_p50_s": round(float(np.percentile(lats, 50)), 3),
               "latency_p90_s": round(float(np.percentile(lats, 90)), 3),
               "latency_max_s": round(lats[-1], 3)}
        print(json.dumps(row), flush=True)
        if not SMOKE:
            with open(OUT, "a") as f:
                f.write(json.dumps(row) + "\n")
        for k in ("latency_p50_s", "latency_p90_s", "latency_max_s"):
            summary[f"{policy}_{k[8:]}"] = row[k]
        del srv
    print(json.dumps(summary), flush=True)
    if not SMOKE:
        with open(OUT, "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
