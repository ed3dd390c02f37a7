"""Profiler-trace pass over the headline decode step (round 4).

The decode roofline attributes the B=256 step by ablation subtraction;
this captures an actual device trace (jax.profiler -> XPlane) of the
headline generate invocation and summarizes per-op device time, to name
WHICH ops make up the 1.99 ms trunk-and-overhead component (bound 0.26)
— LN? residual adds? the KV dynamic_update_slice? reshape/copy fusions?

Writes results/decode_trace.jsonl with the top device ops by self time.
If the axon tunneled runtime cannot collect device traces, records that
instead (the experiment either way).
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("DT_BATCH", 256))
PROMPT = int(os.environ.get("DT_PROMPT", 128))
NEW = int(os.environ.get("DT_NEW", 32))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "decode_trace.jsonl")
TRACE_DIR = os.environ.get("DT_TRACE_DIR", "/tmp/decode_trace")


def summarize_xplane(trace_dir):
    """Top device ops by self-time, via the XPlane proto directly.

    (tensorboard_plugin_profile 2.13's converter is incompatible with
    the installed TF's _pywrap_profiler; the proto walk needs no native
    glue. Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python set
    BEFORE the tensorflow import — done in main().)"""
    import collections

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, "no xplane.pb produced"
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        return None, f"xplane proto import failed: {e!r}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    tpu = [pl for pl in xs.planes if pl.name.startswith("/device:TPU")]
    if not tpu:
        return None, f"no TPU plane in trace ({[p.name for p in xs.planes]})"
    plane = tpu[0]
    md = plane.event_metadata
    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = md[ev.metadata_id].name
            agg[name] += ev.duration_ps
            cnt[name] += 1
    top = [{"op": n.split(" = ")[0], "shape": n.split(" = ")[-1][:90],
            "ms": round(ps / 1e9, 3), "count": cnt[n]}
           for n, ps in agg.most_common(40)]
    return top, None


def main():
    # must precede any tensorflow import (the C++ protobuf impl rejects
    # the plugin's generated descriptors)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import jax
    import jax.numpy as jnp

    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.infer.generate import generate
    from ergm_tpu.models import gpt2
    from ergm_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig.from_model_type(
        "gpt2", vocab_size=50271, dtype="bfloat16", modality_dim=768,
        kv_cache_dtype="int8", cross_kv_dtype="int8")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(gpt2.params_for_inference(params, cfg))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (B, PROMPT)), jnp.int32)
    tts = jnp.asarray(rng.integers(0, 50000, (B, PROMPT)), jnp.int32)
    caps = jnp.asarray(rng.integers(0, 50000, (B, 32)), jnp.int32)

    def run():
        out = generate(params, cfg, ids, PROMPT, max_len=PROMPT + NEW,
                       token_type_ids=tts, caption_ids=caps,
                       greedy=True, eos_id=-1, sp2_id=5)
        return np.asarray(out[0][:2, :2])

    t0 = time.time()
    run()
    warm_s = time.time() - t0
    t0 = time.time()
    run()
    steady_s = time.time() - t0

    os.makedirs(TRACE_DIR, exist_ok=True)
    err = None
    try:
        jax.profiler.start_trace(TRACE_DIR)
        run()
        jax.profiler.stop_trace()
    except Exception as e:
        err = f"trace capture failed: {e!r}"

    top, perr = (None, err) if err else summarize_xplane(TRACE_DIR)
    row = {"study": "decode_trace", "B": B, "prompt": PROMPT, "new": NEW,
           "config": "int8 kv + int8 cross, bf16 w",
           "warm_s": round(warm_s, 2), "steady_s": round(steady_s, 3),
           "trace_dir": TRACE_DIR,
           "top_ops_by_self_time": top, "error": perr}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:2000])


if __name__ == "__main__":
    main()
