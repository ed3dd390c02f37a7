"""Benchmark: tri-modal utterance generation throughput on one chip.

Headline metric (BASELINE.json): utterances/sec/chip for tri-modal
(text + image-feature + audio-feature conditioned) response generation
with KV-cached top-p decode on the flagship GPT-2 geometry.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (SURVEY.md §6), so vs_baseline is the
ratio against this repo's own first recorded TPU run, persisted in
bench_baseline.json (created on first run, value 1.0 then).

Additionally runs the TRAINING-throughput benchmark (scripts/
train_bench.py in-process) and writes its tok/s + MFU JSON to
TRAIN_BENCH.json at the repo root, and a single-request (B=1) latency
measurement to B1_LATENCY.json (stderr log only — stdout stays the
single decode line). Disable with BENCH_TRAIN=0 / BENCH_B1=0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

# bench configuration: flagship gpt2 geometry, realistic dialogue shapes.
# B=256 is the measured per-chip throughput sweet spot on v5e with the
# approx top-k sampler (456.9 vs 417.6 utt/s at B=128; the old exact-sort
# sampler scaled badly with batch, which is why 128 used to win).
BATCH = int(os.environ.get("BENCH_BATCH", 256))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT", 128))
NEW_TOKENS = int(os.environ.get("BENCH_NEW_TOKENS", 128))
MODEL_TYPE = os.environ.get("BENCH_MODEL", "gpt2")
REPS = int(os.environ.get("BENCH_REPS", 3))
# int8 KV cache is the serving configuration: ~1.24x decode throughput
# (37.5k vs 30.2k tok/s measured), >=0.8 greedy token agreement with the
# bf16 cache in tests. BENCH_KV=auto benchmarks the full-precision cache.
KV_DTYPE = os.environ.get("BENCH_KV", "int8")
# Weight dtype for the batch-throughput section. "int8_lm_head" is the
# round-4 default: the tied wte is the one weight whose per-step read
# (77 MB bf16, the greedy matvec+argmax fusion in the device trace) is
# big enough to matter at B=256 — quantizing ONLY it measured +3.4%
# (447.1 -> 462.3 utt/s, results/decode_ablation.jsonl int8_lm_head)
# while FULL int8 stays a wash there (trunk dequant overhead cancels);
# the B=1 section has its own BENCH_B1_WEIGHT (full int8 wins there).
WEIGHT_DTYPE = os.environ.get("BENCH_WEIGHT", "int8_lm_head")
# Cross-attention cache dtype: int8 with factored per-(token, head)
# scales is the round-4 default (4.33 vs 4.44 ms/step at B=256,
# greedy-parity-tested; results/decode_ablation.jsonl int8-combo).
CROSS_DTYPE = os.environ.get("BENCH_CROSS", "int8")
# Each timed rep issues CHAIN back-to-back invocations and fetches once:
# the tunnel transport has a fixed per-invocation host overhead (~30 ms
# fetch + an RPC pipeline floor), so single-invocation wall times
# understate device throughput; chaining amortizes it (the serving
# steady state is back-to-back batches anyway).
CHAIN = int(os.environ.get("BENCH_CHAIN", 4))


def main():
    import jax
    import jax.numpy as jnp

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.generate import generate
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    # persistent compile cache: warm rounds skip the multi-minute cold
    # XLA compiles (the r02 driver run spent 207.6 s in compile+first-run
    # vs 0.56 s/step steady — see README "cold starts"). The cache is
    # content-addressed, so code changes still recompile. Opt out with
    # ERGM_NO_COMPILE_CACHE=1.
    cache_dir = enable_compilation_cache()
    # hit/miss evidence for the cold-compile investigation (VERDICT r3
    # next #6): count cache entries before/after. A compile_s in the
    # minutes WITH a pre-populated cache means the cache missed (or the
    # remote-compile helper bypasses it); entries_after > entries_before
    # pins a miss+fill. The round-3 finding: ~/.cache is wiped between
    # driver rounds (the dir's ctime each round is the round's own first
    # bench run), so every round's FIRST compile of a program is cold —
    # warm numbers require a same-session prior run of the same program.
    def cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1
    entries_before = cache_entries()
    print(f"compile cache: dir={cache_dir} entries={entries_before}",
          file=sys.stderr)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({jax.default_backend()})", file=sys.stderr)

    cfg = ModelConfig.from_model_type(
        MODEL_TYPE, vocab_size=50271, dtype="bfloat16", modality_dim=768,
        kv_cache_dtype=KV_DTYPE, weight_dtype=WEIGHT_DTYPE,
        cross_kv_dtype=CROSS_DTYPE)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(gpt2.params_for_inference(params, cfg))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (BATCH, PROMPT_LEN)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (BATCH, PROMPT_LEN)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((BATCH, 768)), jnp.bfloat16)
    auds = jnp.asarray(rng.standard_normal((BATCH, 768)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 50000, (BATCH, 32)), jnp.int32)

    total = PROMPT_LEN + NEW_TOKENS
    eos_id = 50256

    @jax.jit
    def run(params, ids, tts, imgs, auds, caps, key):
        # eos unused as a real stop so all NEW_TOKENS decode (worst case)
        return generate(
            params, cfg, ids, PROMPT_LEN, max_len=total, eos_id=eos_id,
            sp2_id=50258, top_p=0.8, rng=key, token_type_ids=tts,
            imgs=imgs, auds=auds, caption_ids=caps)

    # compile + warmup. NOTE: block_until_ready is unreliable through the
    # axon tunnel — a host fetch (np.asarray) is the completion barrier.
    t0 = time.time()
    out = run(params, ids, tts, imgs, auds, caps, jax.random.PRNGKey(0))
    np.asarray(out.lengths)
    compile_s = time.time() - t0
    entries_after = cache_entries()
    cache_hit = entries_after == entries_before
    print(f"compile+first run: {compile_s:.1f}s "
          f"(cache entries {entries_before} -> {entries_after}: "
          f"{'HIT/replay' if cache_hit else 'MISS/fill'})", file=sys.stderr)

    times = []
    for i in range(REPS):
        t0 = time.time()
        outs = [run(params, ids, tts, imgs, auds, caps,
                    jax.random.PRNGKey(i * CHAIN + c + 1)) for c in range(CHAIN)]
        for out in outs:  # executions serialize on device; fetch at the end
            lengths = np.asarray(out.lengths)  # forces completion
        times.append((time.time() - t0) / CHAIN)
    best = min(times)
    gen_tokens = int(lengths.sum()) - BATCH * PROMPT_LEN

    utt_per_sec = BATCH / best
    tok_per_sec = gen_tokens / best
    print(f"times: {[f'{t:.3f}' for t in times]}; generated {gen_tokens} tokens; "
          f"{tok_per_sec:.0f} tok/s decode", file=sys.stderr)

    config = {"batch": BATCH, "prompt": PROMPT_LEN,
              "new_tokens": NEW_TOKENS, "model": MODEL_TYPE}
    # batch size is a serving-tuning choice, not part of the workload: the
    # anchor comparison keys on the per-utterance workload only
    workload = {k: config[k] for k in ("prompt", "new_tokens", "model")}
    vs_baseline = 1.0
    base = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
    if base and base.get("value") and all(
            base.get("config", {}).get(k) == v for k, v in workload.items()):
        vs_baseline = utt_per_sec / float(base["value"])
    elif base is None:
        # anchor only once, at the default config — ad-hoc env-override
        # runs must not clobber the recorded baseline
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "trimodal_generate_utterances_per_sec_per_chip",
                       "value": utt_per_sec,
                       "device": dev.device_kind,
                       "config": config}, f, indent=1)

    if os.environ.get("BENCH_B1", "1") not in ("0", "false"):
        try:
            run_b1_latency(cfg)
        except Exception as e:  # the headline must still print
            print(f"B=1 bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    if os.environ.get("BENCH_TRAIN", "1") not in ("0", "false"):
        try:
            run_train_bench()
        except Exception as e:  # the decode headline must still print
            print(f"train bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # compile_s is STARTUP time: cold compile on a first run (20.1 s ->
    # 207.6 s -> 452 s for the SAME program across rounds — remote-compile
    # -path jitter, see README "B=1 variance, reconciled"), persistent-cache
    # replay (seconds) afterward. Steady-state `value` is the metric; run
    # with ERGM_NO_COMPILE_CACHE=1 for cold-start honest compile numbers
    print(json.dumps({
        "metric": "trimodal_generate_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": f"utt/s/chip (B={BATCH}, prompt={PROMPT_LEN}, new={NEW_TOKENS}, "
                f"{MODEL_TYPE}, kv={KV_DTYPE}"
                + (f", w={WEIGHT_DTYPE}" if WEIGHT_DTYPE != "auto" else "")
                + (f", cross={CROSS_DTYPE}" if CROSS_DTYPE != "auto" else "")
                + ")",
        "vs_baseline": round(vs_baseline, 3),
        "compile_s": round(compile_s, 1),
        "compile_cache": "hit" if cache_hit else "miss",
    }))


def run_b1_latency(base_cfg):
    """Single-request latency (north-star p50): B=1, tri-modal, 128-token
    prompt + 32 new tokens, in the B=1 serving configuration (int8
    weight-only quantization by default — the path is weight-read-bound).
    Writes B1_LATENCY.json."""
    import jax
    import jax.numpy as jnp

    from ergm_tpu.infer.generate import generate
    from ergm_tpu.models import gpt2

    prompt = int(os.environ.get("BENCH_B1_PROMPT", 128))
    new = int(os.environ.get("BENCH_B1_NEW", 32))
    wdtype = os.environ.get("BENCH_B1_WEIGHT", "int8")
    # B=1 serving keeps the bf16 KV cache: the cache is tiny at this
    # batch and the per-token quantize ops cost more than they save
    # (0.842 vs 0.863 ms/token measured)
    kv = os.environ.get("BENCH_B1_KV", "auto")
    chain = int(os.environ.get("BENCH_B1_CHAIN", 8))
    # reps raised 3 -> 6: the r02 driver artifact (33.28 ms) vs the
    # README row (27 ms) disagreed by ~20%; p50/p90 over more chains
    # makes the artifact a distribution, not a point (VERDICT r2 #3)
    reps = int(os.environ.get("BENCH_B1_REPS", 6))

    # B=1 is per-op-latency bound: the factored cross-int8 multiply adds
    # ops for bytes it doesn't need to save — keep the bf16 cross cache
    cfg = base_cfg.replace(weight_dtype=wdtype, kv_cache_dtype=kv,
                           cross_kv_dtype=os.environ.get("BENCH_B1_CROSS",
                                                         "auto"))
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(gpt2.params_for_inference(params, cfg))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 50000, (1, prompt)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (1, prompt)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    auds = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    caps = jnp.asarray(rng.integers(0, 50000, (1, 32)), jnp.int32)

    @jax.jit
    def run(params, key):
        return generate(params, cfg, ids, prompt, max_len=prompt + new,
                        eos_id=50256, sp2_id=50258, top_p=0.8, rng=key,
                        token_type_ids=tts, imgs=imgs, auds=auds,
                        caption_ids=caps)

    t0 = time.time()
    out = run(params, jax.random.PRNGKey(0))
    np.asarray(out.lengths)
    b1_compile_s = time.time() - t0
    print(f"b1 compile+first run: {b1_compile_s:.1f}s", file=sys.stderr)
    times = []
    for i in range(reps):
        t0 = time.time()
        outs = [run(params, jax.random.PRNGKey(i * chain + c + 1))
                for c in range(chain)]
        for o in outs:
            np.asarray(o.lengths)
        times.append((time.time() - t0) / chain)
    ts = sorted(times)
    # interpolated percentiles: nearest-rank at N=6 would make "p90" the
    # sample MAX (index int(5.4)=5), overstating the tail it claims to bound
    p50 = float(np.percentile(ts, 50))
    p90 = float(np.percentile(ts, 90))
    payload = {"metric": "trimodal_b1_request_latency_ms",
               "value": round(p50 * 1e3, 2),
               "unit": f"ms/request p50 (B=1, prompt={prompt}, new={new}, "
                       f"{MODEL_TYPE}, kv={kv}, w={wdtype}; "
                       f"N={reps} chains of {chain})",
               "p90_ms": round(p90 * 1e3, 2),
               "min_ms": round(ts[0] * 1e3, 2),
               "ms_per_token": round(p50 / new * 1e3, 3),
               "compile_s": round(b1_compile_s, 1)}

    if os.environ.get("BENCH_B1_SPEC", "1") not in ("0", "false"):
        try:
            payload["speculative"] = b1_speculative(cfg, params, prompt, new,
                                                    chain=chain, reps=max(reps // 2, 2))
        except Exception as e:
            print(f"b1 speculative bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    out_path = os.environ.get("B1_LATENCY_OUT", os.path.join(REPO, "B1_LATENCY.json"))
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"b1: {json.dumps(payload)}", file=sys.stderr)


def b1_speculative(cfg, params, prompt, new, *, chain=8, reps=3,
                   draft_layers=None, gamma=None):
    """B=1 self-speculative decode at the same workload (greedy — the
    acceptance-independent macro-step cost; random weights give ~zero
    acceptance, so request_ms here is the WORST case and t_macro_ms is
    the per-macro-step program cost; realized latency at acceptance a is
    t_macro/(1+a) per token — acceptance on a trained model lives in
    results/spec_bench.jsonl via scripts/spec_bench.py)."""
    import jax
    import jax.numpy as jnp

    from ergm_tpu.infer.speculative import speculative_stats

    draft_layers = int(os.environ.get("BENCH_B1_DRAFT", draft_layers or 3))
    gamma = int(os.environ.get("BENCH_B1_GAMMA", gamma or 4))
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 50000, (1, prompt)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (1, prompt)), jnp.int32)

    def measure(mode, ngram_n):
        @jax.jit
        def run(params, key):
            out, stats = speculative_stats(
                params, cfg, ids, prompt, max_len=prompt + new, eos_id=50256,
                sp2_id=50258, greedy=True, rng=key, token_type_ids=tts,
                draft_layers=draft_layers if mode == "draft" else 0,
                gamma=gamma, mode=mode, ngram_n=ngram_n)
            return out.lengths, stats

        (lengths, (acc, steps, _)) = run(params, jax.random.PRNGKey(0))
        np.asarray(lengths)
        times = []
        for i in range(reps):
            t0 = time.time()
            rs = [run(params, jax.random.PRNGKey(i * chain + c + 1))
                  for c in range(chain)]
            for l, _s in rs:
                np.asarray(l)
            times.append((time.time() - t0) / chain)
        best = min(times)
        steps_f = float(np.asarray(steps))
        return {"request_ms_zero_accept": round(best * 1e3, 2),
                "macro_steps": steps_f,
                "accepted": float(np.asarray(acc)),
                "t_macro_ms": round(best / max(steps_f, 1) * 1e3, 3)}

    out = {"draft_layers": draft_layers, "gamma": gamma,
           **measure("draft", 3)}
    # prompt-lookup drafting: no draft forwards, so t_macro ~ one verify
    # step — the break-even acceptance is a fraction of the draft mode's
    out["ngram"] = {"ngram_n": 3, "gamma": gamma, **measure("ngram", 3)}
    return out


def run_train_bench():
    """Run scripts/train_bench.py in-process, capture its JSON line, and
    persist it to TRAIN_BENCH.json (driver-visible training number +
    MFU — VERDICT r1 missing #4)."""
    import contextlib
    import io
    import runpy

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runpy.run_path(os.path.join(REPO, "scripts", "train_bench.py"),
                       run_name="__main__")
    line = buf.getvalue().strip().splitlines()[-1]
    payload = json.loads(line)
    out_path = os.environ.get("TRAIN_BENCH_OUT", os.path.join(REPO, "TRAIN_BENCH.json"))
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"train: {line}", file=sys.stderr)


if __name__ == "__main__":
    main()
