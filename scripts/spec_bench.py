"""B=1 speculative-decoding benchmark (VERDICT r2 #4).

Two measurements, one JSON line each to results/spec_bench.jsonl:

1. **Cost side** (random weights — acceptance-independent): per-macro-step
   wall time of the speculative program for a (draft_layers, gamma) grid
   vs the plain single-token step, at the north-star B=1 config
   (gpt2 geometry, prompt 128, +32 tokens, int8 weights). From these the
   BREAKEVEN mean-acceptance per config: t_macro / t_plain - 1.

2. **Acceptance side** (SPEC_TRAIN=1): train gpt2 on the synthetic
   dialogue task (a few hundred steps — the task is learnable in
   minutes), then measure the realized acceptance and END-TO-END p50
   latency for 128+32 greedy and sampled decode. Acceptance on this
   task is an optimistic-but-real signal (the model actually predicts
   its data); the cost-side numbers bound what any acceptance rate
   delivers.

    python scripts/spec_bench.py                 # cost grid only
    SPEC_TRAIN=1 python scripts/spec_bench.py    # + trained acceptance
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "spec_bench.jsonl")
PROMPT = int(os.environ.get("SPEC_PROMPT", 128))
NEW = int(os.environ.get("SPEC_NEW", 32))
WDT = os.environ.get("SPEC_WEIGHT", "int8")
def _parse_arm(kg):
    """"k:g" = draft_layers k, gamma g; "nN:g" = prompt-lookup with
    ngram_n N (zero draft compute — gamma can run much larger)."""
    k, g = kg.split(":")
    if k.startswith("n"):
        return ("ngram", int(k[1:]), int(g))
    return ("draft", int(k), int(g))


GRID = [_parse_arm(kg) for kg in
        os.environ.get("SPEC_GRID", "2:2,2:4,3:2,3:4,3:6,4:4").split(",")]
CHAIN = int(os.environ.get("SPEC_CHAIN", 4))
REPS = int(os.environ.get("SPEC_REPS", 3))


def emit(row):
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def timed(fn, *args):
    """Median-of-REPS chained wall time (tunnel-safe: fetch once/chain)."""
    outs = fn(*args)
    np.asarray(jax_fetch(outs))
    times = []
    for _ in range(REPS):
        t0 = time.time()
        rs = [fn(*args) for _ in range(CHAIN)]
        for r in rs:
            np.asarray(jax_fetch(r))
        times.append((time.time() - t0) / CHAIN)
    return min(times)


def jax_fetch(x):
    import jax

    return jax.tree_util.tree_leaves(x)[0]


def _headline_cfg():
    from ergm_tpu.core.config import ModelConfig

    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        weight_dtype=WDT, use_cross_attention=True)
    if os.environ.get("SPEC_SMOKE", "0") not in ("0", "false"):
        # CPU plumbing check: tiny geometry, same code paths
        cfg = cfg.replace(n_layer=4, n_head=4, n_embd=64, n_positions=512,
                          dtype="float32", weight_dtype="auto")
    return cfg


def main():
    import jax

    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    # persistent compile cache (content-addressed): kills the multi-minute
    # tunnel compile on re-runs; ERGM_NO_COMPILE_CACHE=1 opts out
    enable_compilation_cache()
    if os.environ.get("SPEC_COST", "1") in ("0", "false"):
        cfg = _headline_cfg()
        run_trained_acceptance(cfg)
        return
    import jax.numpy as jnp

    from ergm_tpu.infer.generate import generate
    from ergm_tpu.infer.speculative import speculative_stats
    from ergm_tpu.models import gpt2

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    cfg = _headline_cfg()
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    sparams = jax.device_put(gpt2.params_for_inference(params, cfg))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (1, PROMPT)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (1, PROMPT)), jnp.int32)
    total = PROMPT + NEW

    # --- baseline: plain single-token decode
    @jax.jit
    def plain(p, i, t, key):
        return generate(p, cfg, i, PROMPT, max_len=total, eos_id=50256,
                        sp2_id=50258, top_p=0.8, rng=key, token_type_ids=t,
                        greedy=True)

    t_plain = timed(lambda: plain(sparams, ids, tts, jax.random.PRNGKey(1)))
    ms_tok_plain = t_plain / NEW * 1e3
    emit({"config": "baseline_greedy", "prompt": PROMPT, "new": NEW,
          "weight": WDT, "request_ms": round(t_plain * 1e3, 2),
          "ms_per_token": round(ms_tok_plain, 3)})

    # --- cost grid: random weights => acceptance ~ 0 => every macro step
    # emits ~1 token, so request_time/NEW ~= t_macro (upper-bound cost)
    for mode, k, g in GRID:
        @jax.jit
        def spec(p, i, t, key, mode=mode, k=k, g=g):
            out, stats = speculative_stats(
                p, cfg, i, PROMPT, max_len=total, eos_id=50256, sp2_id=50258,
                draft_layers=k if mode == "draft" else 0, gamma=g,
                mode=mode, ngram_n=k if mode == "ngram" else 3,
                greedy=True, rng=key, token_type_ids=t)
            return out.lengths, stats

        t_spec = timed(lambda: spec(sparams, ids, tts, jax.random.PRNGKey(1)))
        (lengths, (acc, steps, _)) = spec(sparams, ids, tts, jax.random.PRNGKey(1))
        steps_f = float(np.asarray(steps))
        t_macro = t_spec / max(steps_f, 1.0)
        tag = f"k{k}" if mode == "draft" else f"n{k}"
        emit({"config": f"spec_cost_{tag}_g{g}", "prompt": PROMPT, "new": NEW,
              "weight": WDT, "request_ms": round(t_spec * 1e3, 2),
              "macro_steps": steps_f,
              "accepted": float(np.asarray(acc)),
              "t_macro_ms": round(t_macro * 1e3, 3),
              "breakeven_mean_accept": round(t_macro / (t_plain / NEW) - 1, 2)})

    if os.environ.get("SPEC_TRAIN", "0") not in ("0", "false"):
        run_trained_acceptance(cfg)


def run_trained_acceptance(cfg):
    """Train gpt2 on the synthetic dialogue task, then measure realized
    acceptance + end-to-end latency of speculative decode on held-out
    synthetic dialogues."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ergm_tpu.core.config import TrainConfig
    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.dataset import DialogueDataset
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.infer.speculative import speculative_stats
    from ergm_tpu.models import gpt2
    from ergm_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="spec_train_")
    # long dialogues (10 turns x 8-15 tokens) so held-out contexts reach
    # the measurement prompt length; short-dialogue defaults max out ~48
    write_synthetic_dataset(tmp, prefixes=("train", "valid"),
                            num_dialogues=48,
                            turns_per_dialogue=int(
                                os.environ.get("SPEC_TRAIN_TURNS", 10)),
                            utter_len=range(8, 16),
                            base_vocab_size=256, seed=11)
    st = read_meta(tmp)
    mcfg = cfg.replace(vocab_size=st.vocab_size, weight_dtype="auto")
    epochs = int(os.environ.get("SPEC_TRAIN_EPOCHS", 6))
    tcfg = TrainConfig(seed=0, data_dir=tmp, ckpt_dir=os.path.join(tmp, "ck"),
                       output_dir="", batch_size=16, num_epochs=epochs,
                       lr=3e-4, max_len=256, dtype="bfloat16",
                       mesh_shape=(1,), valid_prefix="valid")
    tr = Trainer(tcfg, model_config=mcfg)
    tr.train()
    params = jax.device_put(gpt2.params_for_inference(
        tr.state.params, mcfg.replace(weight_dtype=WDT)))
    smcfg = mcfg.replace(weight_dtype=WDT)

    ds = DialogueDataset("valid", tmp, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=256)
    # uniform-length prompts: trim/skip to a fixed length for one program.
    # Adapt plen downward until >=16 prompts qualify (the synthetic task's
    # contexts are bounded) and fail loudly rather than emit empty stats.
    plen = int(os.environ.get("SPEC_TRAIN_PROMPT", 64))
    lens = sorted((len(e.input_ids) for e in ds.examples), reverse=True)
    while plen > 8 and sum(1 for n in lens if n >= plen) < 16:
        plen -= 8
    prompts = [e for e in ds.examples if len(e.input_ids) >= plen][:16]
    if not prompts:
        raise SystemExit(f"no valid examples reach plen={plen}")
    print(f"trained; measuring acceptance on {len(prompts)} prompts "
          f"at plen={plen}", file=sys.stderr)

    from ergm_tpu.infer.generate import generate

    # eos DISABLED (-1 never matches a real token id): the synthetic task's
    # only learnable structure is eos/turn layout, so a trained model ends
    # most greedy continuations instantly; forcing a full NEW-token
    # continuation measures draft/target agreement on the model's actual
    # prediction distribution instead of measuring early exit.
    meas_eos = -1

    @jax.jit
    def plain(p, i, t, key):
        out = generate(p, smcfg, i, plen, max_len=plen + NEW, eos_id=meas_eos,
                       sp2_id=st.sp2_id, greedy=True, rng=key,
                       token_type_ids=t)
        return out.lengths

    base_batch = [
        (jnp.asarray(np.asarray(e.input_ids[:plen])[None], jnp.int32),
         jnp.asarray(np.asarray(e.token_type_ids[:plen])[None], jnp.int32),
         jax.random.PRNGKey(n)) for n, e in enumerate(prompts)]
    for i, t, key in base_batch:       # warm-up / compile
        np.asarray(plain(params, i, t, key))
    t0 = time.time()
    last = None
    for i, t, key in base_batch:
        last = plain(params, i, t, key)
    np.asarray(last)
    emit({"config": "trained_baseline_greedy", "prompt": plen, "new": NEW,
          "weight": WDT,
          "mean_request_ms": round(
              (time.time() - t0) / len(base_batch) * 1e3, 2)})

    modes = [("greedy", True)] * len(GRID) + [("sampled", False)] * len(GRID)
    for (dmode, k, g), (mode, use_greedy) in zip(GRID * 2, modes):
        @jax.jit
        def spec(p, i, t, key, dmode=dmode, k=k, g=g, use_greedy=use_greedy):
            out, stats = speculative_stats(
                p, smcfg, i, plen, max_len=plen + NEW, eos_id=meas_eos,
                sp2_id=st.sp2_id, draft_layers=k if dmode == "draft" else 0,
                gamma=g, mode=dmode, ngram_n=k if dmode == "ngram" else 3,
                greedy=use_greedy,
                top_p=0.8, rng=key, token_type_ids=t)
            return out.lengths, stats

        batch = [(jnp.asarray(np.asarray(e.input_ids[:plen])[None], jnp.int32),
                  jnp.asarray(np.asarray(e.token_type_ids[:plen])[None],
                              jnp.int32), jax.random.PRNGKey(n))
                 for n, e in enumerate(prompts)]
        # warm-up + acceptance stats (fetched per prompt, untimed)
        accs, stepss, new_toks = [], [], []
        for i, t, key in batch:
            lengths, (acc, steps, _) = spec(params, i, t, key)
            new_toks.append(float(np.asarray(lengths)[0]) - plen)
            accs.append(float(np.asarray(acc)))
            stepss.append(float(np.asarray(steps)))
        # timed: chain all prompts, fetch once (tunnel fetch overhead ~30 ms
        # per round-trip would otherwise dominate a ~20 ms request)
        t0 = time.time()
        last = None
        for i, t, key in batch:
            last = spec(params, i, t, key)
        np.asarray(last[0])
        mean_ms = (time.time() - t0) / len(batch) * 1e3
        mean_acc = float(np.sum(accs) / max(np.sum(stepss), 1))
        tag = f"k{k}" if dmode == "draft" else f"n{k}"
        emit({"config": f"spec_trained_{mode}_{tag}_g{g}", "prompt": plen,
              "new": NEW, "weight": WDT,
              "mean_accept_per_step": round(mean_acc, 3),
              "tokens_per_macro_step": round(
                  float(np.sum(new_toks) / max(np.sum(stepss), 1)), 3),
              "mean_request_ms": round(mean_ms, 2)})


if __name__ == "__main__":
    main()
