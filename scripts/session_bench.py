"""Multi-turn session serving benchmark (run on the TPU).

Simulates a dialogue: each turn appends the previous reply plus a new
user utterance and asks for the next reply. Two arms over the SAME
token sequences:

- ``session``: requests share a session_id — the server parks the slot
  between turns and prefills only the delta (incremental prefill).
- ``fresh``: every turn is a new request — full prefill of the whole
  history each time (the reference-style cost).

Greedy, random weights (eos ~never fires, so turn shapes are exact and
identical across arms). Reports per-turn wall clock by history length.

    python scripts/session_bench.py
    SESSION_TURNS=12 SESSION_MODEL=gpt2 python scripts/session_bench.py

Appends JSON lines to results/session_bench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "session_bench.jsonl")
MODEL = os.environ.get("SESSION_MODEL", "gpt2")
TURNS = int(os.environ.get("SESSION_TURNS", 12))
START = int(os.environ.get("SESSION_START", 64))   # opening prompt tokens
USER = int(os.environ.get("SESSION_USER", 16))     # user tokens per turn
REPLY = int(os.environ.get("SESSION_REPLY", 16))   # reply budget per turn
SYNC = int(os.environ.get("SESSION_SYNC", 8))
SLOTS = int(os.environ.get("SESSION_SLOTS", 8))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def run_conversation(srv, Request, rng, use_session):
    """One full conversation; returns [(history_len, turn_wall_s), ...]."""
    history = rng.integers(0, 50000, (START,)).tolist()
    sid = "conv" if use_session else None
    stats = []
    for _ in range(TURNS):
        t0 = time.time()
        rid = srv.submit(Request(prompt_ids=history, max_new_tokens=REPLY,
                                 greedy=True, session_id=sid))
        reply = srv.run_until_drained()[rid].tokens
        stats.append((len(history), time.time() - t0))
        history = history + reply + rng.integers(0, 50000, (USER,)).tolist()
    return stats


def main():
    import jax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.server import ContinuousServer, Request
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cfg = ModelConfig.from_model_type(
        MODEL, vocab_size=50271, dtype="bfloat16", modality_dim=768,
        use_cross_attention=False)
    params = jax.device_put(gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg))

    final_hist = START + (TURNS - 1) * (USER + REPLY)
    max_prompt = ((final_hist + 63) // 64) * 64
    srv = ContinuousServer(params, cfg, slots=SLOTS, eos_id=50256,
                           sp2_id=50258, max_prompt=max_prompt,
                           prompt_bucket=64, sync_every=SYNC)

    for arm, use_session in (("session", True), ("fresh", False)):
        rng = np.random.default_rng(0)  # identical token streams per arm
        t0 = time.time()
        run_conversation(srv, Request, rng, use_session)  # compile warmup
        warm = time.time() - t0
        print(f"{arm} warmup (incl. compiles): {warm:.1f}s", file=sys.stderr)
        srv.reset()
        rng = np.random.default_rng(0)
        stats = run_conversation(srv, Request, rng, use_session)
        srv.reset()
        total = sum(s for _, s in stats)
        emit({"arm": arm, "model": MODEL, "turns": TURNS,
              "start": START, "user": USER, "reply": REPLY,
              "sync_every": SYNC, "total_s": round(total, 3),
              "per_turn_ms": [(h, round(1e3 * s, 1)) for h, s in stats],
              "last_turn_ms": round(1e3 * stats[-1][1], 1),
              "warmup_s": round(warm, 1)})


if __name__ == "__main__":
    main()
