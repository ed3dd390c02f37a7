"""Ablation microbenchmark for the TRAIN step (run on the TPU) — the
MFU-hunting companion of decode_ablation.py.

Variants decompose the full train step (fwd + joint loss + bwd + AdamW):

  full     - the real step (scripts/train_bench.py measures this)
  fwd      - eval step only (no grad/optimizer)      -> bwd+opt cost
  noce     - LM loss replaced by mean(hidden)        -> chunked-CE cost
  noattn   - attention output replaced by q          -> attention cost
  noemo    - emotion loss dropped                    -> emotion-head cost
  xla_attn - attention_impl=xla                      -> flash-kernel delta

Env: AB_BATCH / AB_SEQ / AB_MODEL / AB_REMAT / AB_REMAT_POLICY / AB_REPS /
AB_CHAIN. Appends one JSON line per variant to results/train_ablation.jsonl.

Usage: python scripts/train_ablation.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("AB_BATCH", 64))
SEQ = int(os.environ.get("AB_SEQ", 512))
MODEL = os.environ.get("AB_MODEL", "gpt2")
REPS = int(os.environ.get("AB_REPS", 2))
CHAIN = int(os.environ.get("AB_CHAIN", 4))
REMAT = os.environ.get("AB_REMAT", "1") not in ("0", "false")
REMAT_POLICY = os.environ.get("AB_REMAT_POLICY", "full")
LM_LOSS = os.environ.get("AB_LM_LOSS", "auto")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "train_ablation.jsonl")

VARIANTS = ["full", "fwd", "noce", "noattn", "noemo", "xla_attn"]


def run_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models import gpt2
    from ergm_tpu.train import steps as steps_mod

    from ergm_tpu.ops import fused_ce as fused_mod

    cfg = ModelConfig.from_model_type(
        MODEL, vocab_size=50271, dtype="bfloat16", modality_dim=768,
        attn_pdrop=0.0, remat=REMAT, remat_policy=REMAT_POLICY,
        lm_loss_impl=LM_LOSS,
        attention_impl="xla" if name == "xla_attn" else "auto")

    real_mha = gpt2.multihead_attention
    real_chunk = gpt2.chunked_lm_loss
    real_fused = fused_mod.fused_lm_loss
    if name == "noattn":
        gpt2.multihead_attention = lambda q, k, v, **kw: q
    if name == "noce":
        gpt2.chunked_lm_loss = lambda hidden, wte, labels, **kw: \
            jnp.mean(hidden.astype(jnp.float32))
        fused_mod.fused_lm_loss = lambda hidden, wte, labels, **kw: \
            jnp.mean(hidden.astype(jnp.float32))
    try:
        params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
        tx = optax.adamw(1e-4)
        state = steps_mod.create_train_state(params, tx)
        rng0 = np.random.default_rng(0)
        ids = rng0.integers(0, 50000, (B, SEQ))
        batch = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "token_type_ids": jnp.asarray(ids, jnp.int32),
            "labels": jnp.asarray(ids, jnp.int32),
            "emotion_labels": jnp.asarray(rng0.integers(0, 7, (B,)), jnp.int32),
            "imgs": jnp.asarray(rng0.standard_normal((B, 768)), jnp.float32),
            "auds": jnp.asarray(rng0.standard_normal((B, 768)), jnp.float32),
            "valid": jnp.ones((B,), bool),
        }
        if name == "noemo":
            import functools

            orig = steps_mod._losses_and_metrics

            def no_emo(params_, config_, batch_, deterministic, rng, **kw):
                loss, metrics = orig(params_, config_, batch_, deterministic,
                                     rng, **kw)
                return metrics["lm_loss"], metrics

            steps_mod._losses_and_metrics = no_emo
        key = jax.random.PRNGKey(0)
        if name == "fwd":
            ev = steps_mod.make_eval_step(cfg)

            def step(state_, batch_, key_):
                return state_, ev(state_.params, batch_)
        else:
            step = steps_mod.make_train_step(cfg, tx)

        t0 = time.time()
        state, m = step(state, batch, key)
        _ = float(m["loss"])
        compile_s = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            for _ in range(CHAIN):
                state, m = step(state, batch, key)
            _ = float(m["loss"])
            times.append((time.time() - t0) / CHAIN)
        best = min(times)
        return {"variant": name, "B": B, "L": SEQ, "remat": REMAT,
                "policy": REMAT_POLICY, "lm_loss": LM_LOSS,
                "step_ms": round(best * 1000, 1),
                "tok_per_s": round(B * SEQ / best, 1),
                "compile_s": round(compile_s, 1),
                "times_ms": [round(t * 1000, 1) for t in times]}
    finally:
        gpt2.multihead_attention = real_mha
        gpt2.chunked_lm_loss = real_chunk
        fused_mod.fused_lm_loss = real_fused
        if name == "noemo":
            steps_mod._losses_and_metrics = orig


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for name in (sys.argv[1:] or VARIANTS):
        res = run_variant(name)
        print(json.dumps(res), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
