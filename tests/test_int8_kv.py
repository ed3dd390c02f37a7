"""int8 KV-cache quality on a TRAINED model (VERDICT r1 weak #3 / item 7).

Round 1 gated the int8 default on ">=0.8 greedy token agreement" measured
on random-init weights — a loose bar on meaningless (near-uniform)
distributions. Here a tiny model is OVERFIT on the synthetic task so its
next-token distributions are sharp, then the int8 cache is compared
against the bf16/fp32 cache on the decode path it actually serves:

- per-step next-token TV distance (0.5 * sum |p - q|) along a forced
  gold continuation,
- teacher-forced continuation PPL delta,
- greedy decode agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.data.assembly import read_meta
from ergm_tpu.data.dataset import DialogueDataset, batches
from ergm_tpu.data.synthetic import write_synthetic_dataset
from ergm_tpu.models import gpt2
from ergm_tpu.train.steps import batch_to_device, create_train_state, make_train_step

MAX_LEN = 64


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("int8data"))
    write_synthetic_dataset(d, prefixes=("train",), num_dialogues=6,
                            turns_per_dialogue=4, base_vocab_size=128)
    st = read_meta(d)
    mcfg = ModelConfig(vocab_size=st.vocab_size, n_positions=MAX_LEN, n_embd=64,
                       n_layer=2, n_head=4, use_cross_attention=False,
                       dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                       resid_pdrop=0.0)
    ds = DialogueDataset("train", d, sp1_id=st.sp1_id, sp2_id=st.sp2_id,
                         eos_id=st.eos_id, max_len=MAX_LEN)
    tx = optax.adamw(3e-3)
    state = create_train_state(gpt2.init_params(jax.random.PRNGKey(0), mcfg), tx)
    step = make_train_step(mcfg, tx)
    rng = jax.random.PRNGKey(0)
    batch = batch_to_device(next(batches(ds, 8, st.eos_id, max_len=MAX_LEN)))
    for _ in range(120):  # overfit: sharp, trained distributions
        state, m = step(state, batch, rng)
    assert float(m["lm_loss"]) < 1.0, "did not overfit"
    return state.params, mcfg, st, ds


def _stepwise_probs(params, cfg, prompt, cont, kv_dtype):
    """Teacher-forced decode along `cont`; returns [T, V] next-token
    probabilities computed through the KV-cached single-token path."""
    c = cfg.replace(kv_cache_dtype=kv_dtype)
    Lp, T = len(prompt), len(cont)
    cache = gpt2.init_kv_cache(c, 1, Lp + T)
    out = gpt2.forward(params, c, jnp.asarray([prompt]), cache=cache)
    probs = [jax.nn.softmax(out.logits[0, -1].astype(jnp.float32))]
    cache = out.cache
    for t in range(T - 1):
        out = gpt2.forward(params, c, jnp.asarray([[cont[t]]]), cache=cache)
        probs.append(jax.nn.softmax(out.logits[0, -1].astype(jnp.float32)))
        cache = out.cache
    return np.stack([np.asarray(p) for p in probs])


def test_int8_kv_quality_on_trained_model(trained):
    params, mcfg, st, ds = trained
    ex = ds.examples[0]
    # prompt = masked history; continuation = the supervised tail
    n_hist = next(i for i, l in enumerate(ex.labels) if l != -100)
    n_hist = max(n_hist, 2)
    prompt = ex.input_ids[:n_hist]
    cont = ex.input_ids[n_hist:n_hist + 12]
    assert len(cont) >= 6

    p_ref = _stepwise_probs(params, mcfg, prompt, cont, "auto")
    p_int8 = _stepwise_probs(params, mcfg, prompt, cont, "int8")

    tv = 0.5 * np.abs(p_ref - p_int8).sum(axis=-1)
    # teacher-forced continuation PPL under each cache
    idx = np.arange(len(cont))
    ppl_ref = float(np.exp(-np.log(np.maximum(p_ref[idx, cont], 1e-20)).mean()))
    ppl_int8 = float(np.exp(-np.log(np.maximum(p_int8[idx, cont], 1e-20)).mean()))
    agree = float((p_ref.argmax(-1) == p_int8.argmax(-1)).mean())

    print(f"int8-vs-ref: TV mean={tv.mean():.4f} max={tv.max():.4f} "
          f"ppl_ref={ppl_ref:.4f} ppl_int8={ppl_int8:.4f} greedy_agree={agree:.2f}")
    # quality gates for the serving default (README documents the numbers)
    assert tv.mean() < 0.05, f"mean TV {tv.mean():.4f} too high"
    assert tv.max() < 0.15, f"max TV {tv.max():.4f} too high"
    assert abs(np.log(ppl_int8 / ppl_ref)) < 0.05, (ppl_ref, ppl_int8)
    assert agree == 1.0


def test_int8_kv_greedy_decode_agreement(trained):
    """Full greedy generations agree between cache dtypes on the trained
    model (end-to-end decode path incl. sampling plumbing)."""
    from ergm_tpu.infer.generate import generate

    params, mcfg, st, ds = trained
    ex = ds.examples[1]
    prompt = jnp.asarray([ex.input_ids[:8]])
    outs = {}
    for kv in ("auto", "int8"):
        c = mcfg.replace(kv_cache_dtype=kv)
        g = generate(params, c, prompt, 8, max_len=32, eos_id=st.eos_id,
                     sp2_id=st.sp2_id, greedy=True, rng=jax.random.PRNGKey(0))
        outs[kv] = np.asarray(g.tokens)[0, 8:int(g.lengths[0])].tolist()
    assert outs["auto"] == outs["int8"], outs


def test_factored_int8_attention_long_cache(trained):
    """Caches >= 512 slots take the scale-factored int8 attention path
    (scores on the raw int8 cache, per-key scales folded into the
    logits/probs) — greedy decode must still agree with the bf16 cache."""
    from ergm_tpu.infer.generate import generate

    params, mcfg, st, ds = trained
    ex = ds.examples[2]
    prompt = jnp.asarray([ex.input_ids[:8]])
    outs = {}
    for kv in ("auto", "int8"):
        c = mcfg.replace(kv_cache_dtype=kv, n_positions=1024)
        g = generate(params, c, prompt, 8, max_len=512, eos_id=st.eos_id,
                     sp2_id=st.sp2_id, greedy=True, logical_cap=24,
                     rng=jax.random.PRNGKey(0))
        outs[kv] = np.asarray(g.tokens)[0, 8:int(g.lengths[0])].tolist()
    assert outs["auto"] == outs["int8"], outs


def test_int4_pack_unpack_roundtrip():
    """Halves-based nibble packing is exact for values in [-7, 7] and
    restores element order (models/gpt2.py _pack_int4/_unpack_int4)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-7, 8, (3, 5, 64)), jnp.int8)
    packed = gpt2._pack_int4(x)
    assert packed.shape == (3, 5, 32)
    np.testing.assert_array_equal(np.asarray(gpt2._unpack_int4(packed)),
                                  np.asarray(x))


def test_int4_kv_quality_on_trained_model(trained):
    """int4 (packed-nibble) cache quality on the trained model: looser
    gates than int8 (4-bit mantissas), but the distribution must stay
    close and greedy agreement high — the numbers documented for the
    serving option."""
    params, mcfg, st, ds = trained
    ex = ds.examples[0]
    n_hist = next(i for i, l in enumerate(ex.labels) if l != -100)
    n_hist = max(n_hist, 2)
    prompt = ex.input_ids[:n_hist]
    cont = ex.input_ids[n_hist:n_hist + 12]

    p_ref = _stepwise_probs(params, mcfg, prompt, cont, "auto")
    p_int4 = _stepwise_probs(params, mcfg, prompt, cont, "int4")

    tv = 0.5 * np.abs(p_ref - p_int4).sum(axis=-1)
    idx = np.arange(len(cont))
    ppl_ref = float(np.exp(-np.log(np.maximum(p_ref[idx, cont], 1e-20)).mean()))
    ppl_int4 = float(np.exp(-np.log(np.maximum(p_int4[idx, cont], 1e-20)).mean()))
    agree = float((p_ref.argmax(-1) == p_int4.argmax(-1)).mean())
    print(f"int4-vs-ref: TV mean={tv.mean():.4f} max={tv.max():.4f} "
          f"ppl_ref={ppl_ref:.4f} ppl_int4={ppl_int4:.4f} greedy_agree={agree:.2f}")
    assert tv.mean() < 0.15, f"mean TV {tv.mean():.4f} too high"
    assert abs(np.log(ppl_int4 / ppl_ref)) < 0.25, (ppl_ref, ppl_int4)
    assert agree >= 0.9


def test_int4_kv_greedy_decode_agreement(trained):
    """Greedy decode through the int4 cache stays on-distribution: the
    generation must agree with the bf16 cache on the sharp overfit
    model (same bar int8 clears)."""
    from ergm_tpu.infer.generate import generate

    params, mcfg, st, ds = trained
    ex = ds.examples[1]
    prompt = jnp.asarray([ex.input_ids[:8]])
    outs = {}
    for kv in ("auto", "int4"):
        c = mcfg.replace(kv_cache_dtype=kv)
        g = generate(params, c, prompt, 8, max_len=32, eos_id=st.eos_id,
                     sp2_id=st.sp2_id, greedy=True, rng=jax.random.PRNGKey(0))
        outs[kv] = np.asarray(g.tokens)[0, 8:int(g.lengths[0])].tolist()
    assert outs["auto"] == outs["int4"], outs


def test_int4_factored_long_cache_agreement(trained):
    """The T>=512 factored path also unpacks nibbles before the raw-int
    einsum; greedy agreement through it."""
    from ergm_tpu.infer.generate import generate

    params, mcfg, st, ds = trained
    ex = ds.examples[2]
    prompt = jnp.asarray([ex.input_ids[:8]])
    outs = {}
    for kv in ("auto", "int4"):
        c = mcfg.replace(kv_cache_dtype=kv, n_positions=1024)
        g = generate(params, c, prompt, 8, max_len=512, eos_id=st.eos_id,
                     sp2_id=st.sp2_id, greedy=True, logical_cap=24,
                     rng=jax.random.PRNGKey(0))
        outs[kv] = np.asarray(g.tokens)[0, 8:int(g.lengths[0])].tolist()
    assert outs["auto"] == outs["int4"], outs
