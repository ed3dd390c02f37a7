"""Weight-only int8 serving (models/gpt2.py quantize_params_int8 +
dense's kernel_q path): quantization error bounds, forward fidelity,
and the KV-cached decode path end-to-end."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import generate
from ergm_tpu.models import gpt2


def small_cfg(**kw):
    return ModelConfig.from_model_type(
        "gpt2", n_layer=2, n_embd=64, n_head=4, vocab_size=160,
        n_positions=64, dtype="float32", modality_dim=16,
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0, **kw)


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 32, 48)), jnp.float32)
    q, s = gpt2._quantize_kernel(k)
    assert q.dtype == jnp.int8 and s.shape == (3, 1, 48)
    err = np.abs(np.asarray(q.astype(jnp.float32) * s - k))
    # symmetric per-channel int8: error bounded by scale/2 per element
    assert np.all(err <= np.asarray(s) / 2 + 1e-6)


def test_quantized_tree_shape_and_skips():
    cfg = small_cfg()
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    qp = gpt2.quantize_params_int8(params, cfg)
    # dense kernels replaced
    assert "kernel_q" in qp["blocks"]["attn"]["c_attn"]
    assert "kernel" not in qp["blocks"]["attn"]["c_attn"]
    assert qp["blocks"]["mlp"]["c_fc"]["kernel_q"].dtype == jnp.int8
    # wte quantized per row; wpe / emotion head untouched
    assert qp["wte"]["embedding_q"].dtype == jnp.int8
    assert qp["wte"]["embedding_scale"].shape == (160, 1)
    assert "embedding" in qp["wpe"]
    assert "kernel" in qp["emotion_head"]


def test_forward_close_and_decode_runs():
    cfg = small_cfg(weight_dtype="int8")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 150, (2, 16)), jnp.int32)

    full = jax.jit(lambda p: gpt2.forward(p, cfg, ids).logits)(params)
    qparams = gpt2.params_for_inference(params, cfg)
    quant = jax.jit(lambda p: gpt2.forward(p, cfg, ids).logits)(qparams)
    # random-init logits are O(1); int8 per-channel keeps them close
    # (wte rows are also quantized now, so both embed and lm_head drift)
    err = float(jnp.max(jnp.abs(full - quant)))
    ref = float(jnp.max(jnp.abs(full)))
    assert err < 0.08 * max(ref, 1.0), (err, ref)
    # greedy next-token agreement on random init
    agree = float(jnp.mean(jnp.argmax(full[:, -1], -1) == jnp.argmax(quant[:, -1], -1)))
    assert agree == 1.0

    out = generate(qparams, cfg, ids, input_len=16, max_len=24, eos_id=158,
                   sp2_id=159, rng=jax.random.PRNGKey(0), greedy=True)
    assert np.asarray(out.tokens).shape == (2, 24)


def test_params_for_inference_order():
    """Quantization happens before the compute-dtype cast (from the
    full-precision masters), and non-kernel floats still get cast."""
    cfg = dataclasses.replace(small_cfg(weight_dtype="int8"), dtype="bfloat16")
    params = gpt2.init_params(jax.random.PRNGKey(0), small_cfg())  # fp32
    sp = gpt2.params_for_inference(params, cfg)
    assert sp["blocks"]["mlp"]["c_fc"]["kernel_q"].dtype == jnp.int8
    assert sp["blocks"]["mlp"]["c_fc"]["kernel_scale"].dtype == jnp.bfloat16
    assert sp["wte"]["embedding_q"].dtype == jnp.int8
    assert sp["wpe"]["embedding"].dtype == jnp.bfloat16


def test_int8_weight_quality_on_trained_model():
    """int8 weights vs full precision on a TRAINED (overfit-synthetic)
    model: per-step next-token TV distance, teacher-forced continuation
    PPL delta, greedy agreement — the int8-KV methodology applied to the
    weight-only quantized serving path (README documents the numbers)."""
    import optax

    from ergm_tpu.data.assembly import read_meta
    from ergm_tpu.data.dataset import DialogueDataset, batches
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.train.steps import (batch_to_device, create_train_state,
                                      make_train_step)

    import tempfile

    d = tempfile.mkdtemp(prefix="w8data")
    write_synthetic_dataset(d, prefixes=("train",), num_dialogues=6,
                            turns_per_dialogue=4, base_vocab_size=128)
    st = read_meta(d)
    mcfg = ModelConfig(vocab_size=st.vocab_size, n_positions=64, n_embd=64,
                       n_layer=2, n_head=4, use_cross_attention=False,
                       dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                       resid_pdrop=0.0)
    ds = DialogueDataset("train", d, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=64)
    tx = optax.adamw(3e-3)
    state = create_train_state(gpt2.init_params(jax.random.PRNGKey(0), mcfg), tx)
    step = make_train_step(mcfg, tx)
    batch = batch_to_device(next(batches(ds, 8, st.eos_id, max_len=64)))
    rng = jax.random.PRNGKey(0)
    for _ in range(120):
        state, m = step(state, batch, rng)
    assert float(m["lm_loss"]) < 1.0, "did not overfit"
    params = state.params

    qcfg = mcfg.replace(weight_dtype="int8")
    qparams = gpt2.params_for_inference(params, qcfg)

    ex = ds.examples[0]
    n_hist = max(next(i for i, l in enumerate(ex.labels) if l != -100), 2)
    prompt = jnp.asarray([ex.input_ids[:n_hist]])
    cont = ex.input_ids[n_hist:n_hist + 12]

    def stepwise(p, cfg):
        cache = gpt2.init_kv_cache(cfg, 1, n_hist + len(cont))
        out = gpt2.forward(p, cfg, prompt, cache=cache)
        probs = [jax.nn.softmax(out.logits[0, -1].astype(jnp.float32))]
        cache = out.cache
        for t in range(len(cont) - 1):
            out = gpt2.forward(p, cfg, jnp.asarray([[cont[t]]]), cache=cache)
            probs.append(jax.nn.softmax(out.logits[0, -1].astype(jnp.float32)))
            cache = out.cache
        return np.stack([np.asarray(x) for x in probs])

    p_ref = stepwise(params, mcfg)
    p_q = stepwise(qparams, qcfg)
    tv = 0.5 * np.abs(p_ref - p_q).sum(axis=-1)
    idx = np.arange(len(cont))
    ppl_ref = float(np.exp(-np.log(np.maximum(p_ref[idx, cont], 1e-20)).mean()))
    ppl_q = float(np.exp(-np.log(np.maximum(p_q[idx, cont], 1e-20)).mean()))
    agree = float((p_ref.argmax(-1) == p_q.argmax(-1)).mean())
    print(f"w8-vs-ref: TV mean={tv.mean():.4f} max={tv.max():.4f} "
          f"ppl_ref={ppl_ref:.4f} ppl_w8={ppl_q:.4f} greedy_agree={agree:.2f}")
    assert tv.mean() < 0.05, f"mean TV {tv.mean():.4f} too high"
    assert tv.max() < 0.15, f"max TV {tv.max():.4f} too high"
    assert abs(np.log(ppl_q / ppl_ref)) < 0.05, (ppl_ref, ppl_q)
    assert agree == 1.0


def test_beam_search_with_int8_weights():
    """Beam decode runs on the quantized serving params (the int8 lm_head
    logits path feeds beam scoring)."""
    from ergm_tpu.infer.beam import beam_search_batch

    cfg = small_cfg(weight_dtype="int8")
    params = gpt2.params_for_inference(
        gpt2.init_params(jax.random.PRNGKey(0), cfg), cfg)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 150, (9,)).tolist(),
               rng.integers(0, 150, (14,)).tolist()]
    results, emo = beam_search_batch(
        params, cfg, prompts, num_beams=2, max_len=32, eos_id=158,
        sp2_id=159, max_new_tokens=6)
    assert len(results) == 2 and all(len(r) <= 7 for r in results)
    assert emo.shape[0] == 2 and np.isfinite(emo).all()
