"""Self-speculative decoding tests (ergm_tpu/infer/speculative.py).

The load-bearing property: GREEDY speculative decode emits the
byte-identical sequence plain greedy decode emits, for any draft depth
and any gamma — acceptance only changes HOW FAST tokens appear, never
WHICH tokens. Sampling mode is checked for the rejection-sampling
identity statistically (marginal of the first speculated position
matches direct nucleus sampling on a tiny vocab).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import generate
from ergm_tpu.infer.speculative import (draft_params, speculative_generate,
                                        speculative_stats)
from ergm_tpu.models import gpt2

VOCAB, EOS, SP2 = 64, 60, 61


def make_cfg(**kw):
    base = dict(vocab_size=VOCAB, n_positions=64, n_embd=32, n_layer=3,
                n_head=4, use_cross_attention=False, dtype="float32",
                embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = make_cfg()
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 50, (1, 8)), jnp.int32)
    return cfg, params, ids


def test_draft_params_slices_blocks(setup):
    cfg, params, _ = setup
    dp, dcfg = draft_params(params, cfg, 2)
    assert dcfg.n_layer == 2
    assert dp["blocks"]["attn"]["c_attn"]["kernel"].shape[0] == 2
    # shared embeddings: same arrays, not copies
    assert dp["wte"]["embedding"] is params["wte"]["embedding"]
    with pytest.raises(ValueError):
        draft_params(params, cfg, cfg.n_layer)


@pytest.mark.parametrize("gamma", [1, 2, 4])
@pytest.mark.parametrize("draft_layers", [1, 2])
def test_greedy_spec_identical_to_greedy_decode(setup, gamma, draft_layers):
    cfg, params, ids = setup
    cap = 24
    ref = jax.jit(lambda p, i: generate(
        p, cfg, i, 8, max_len=cap, eos_id=EOS, sp2_id=SP2,
        greedy=True, rng=jax.random.PRNGKey(0)))(params, ids)
    got = jax.jit(lambda p, i: speculative_generate(
        p, cfg, i, 8, max_len=cap, eos_id=EOS, sp2_id=SP2,
        draft_layers=draft_layers, gamma=gamma, greedy=True,
        rng=jax.random.PRNGKey(0)))(params, ids)
    rl, gl = int(ref.lengths[0]), int(got.lengths[0])
    assert gl == rl, (np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.tokens[0, :rl]),
                                  np.asarray(got.tokens[0, :gl]))


def test_greedy_spec_with_modalities_and_captions(setup):
    """Conditioning rides through both draft and verify paths."""
    cfg = make_cfg(use_cross_attention=True)
    params = gpt2.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50, (1, 8)), jnp.int32)
    imgs = jnp.asarray(rng.standard_normal((1, cfg.modality_dim)), jnp.float32)
    auds = jnp.asarray(rng.standard_normal((1, cfg.modality_dim)), jnp.float32)
    caps = jnp.asarray(rng.integers(0, 50, (1, 6)), jnp.int32)
    cmask = jnp.ones((1, 6), jnp.float32)
    kw = dict(max_len=20, eos_id=EOS, sp2_id=SP2, greedy=True,
              imgs=imgs, auds=auds, caption_ids=caps, caption_mask=cmask,
              rng=jax.random.PRNGKey(0))
    ref = jax.jit(lambda p, i: generate(p, cfg, i, 8, **kw))(params, ids)
    got = jax.jit(lambda p, i: speculative_generate(
        p, cfg, i, 8, draft_layers=2, gamma=3, **kw))(params, ids)
    rl = int(ref.lengths[0])
    assert int(got.lengths[0]) == rl
    np.testing.assert_array_equal(np.asarray(ref.tokens[0, :rl]),
                                  np.asarray(got.tokens[0, :rl]))
    np.testing.assert_allclose(np.asarray(ref.emotion_logits),
                               np.asarray(got.emotion_logits), atol=1e-5)


def test_full_depth_draft_accepts_everything(setup):
    """A draft as deep as the target minus nothing isn't allowed, but a
    (n_layer-1)-layer draft on a model whose last block is ~identity
    would accept most tokens; here we just assert the stats plumbing:
    accepted <= proposed and steps >= 1."""
    cfg, params, ids = setup
    out, (accepted, steps, proposed) = jax.jit(
        lambda p, i: speculative_stats(
            p, cfg, i, 8, max_len=24, eos_id=EOS, sp2_id=SP2,
            draft_layers=2, gamma=3, greedy=True,
            rng=jax.random.PRNGKey(0)))(params, ids)
    assert int(steps) >= 1
    assert 0 <= int(accepted) <= int(steps) * 3
    # every macro step emits at least one token
    assert int(out.lengths[0]) - 8 >= min(int(steps), 24 - 8)


def test_sampling_spec_marginal_matches_direct():
    """Rejection sampling preserves the nucleus-filtered target
    distribution: the marginal of the SECOND generated token (the first
    speculated one) over many seeds matches direct sampling's."""
    cfg = make_cfg(vocab_size=16, n_embd=16, n_head=2, n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    n, cap = 400, 7

    def batch_counts(fn):
        counts = np.zeros(16)
        for s in range(n):
            out = fn(jax.random.PRNGKey(1000 + s))
            toks = np.asarray(out.tokens[0])
            counts[toks[5]] += 1  # position Lp+1: first speculated slot
        return counts / n

    direct_fn = jax.jit(lambda k: generate(
        params, cfg, ids, 4, max_len=cap, eos_id=15, sp2_id=14, top_p=0.9,
        sample_top_k=0, rng=k))
    spec_fn = jax.jit(lambda k: speculative_generate(
        params, cfg, ids, 4, max_len=cap, eos_id=15, sp2_id=14, top_p=0.9,
        draft_layers=1, gamma=2, rng=k))
    direct = batch_counts(direct_fn)
    spec = batch_counts(spec_fn)
    tv = 0.5 * np.abs(direct - spec).sum()
    assert tv < 0.15, (tv, direct, spec)


def test_masked_leftpad_matches_uniform(setup):
    """prompt_mask (bucketed left-pad) mode: identical greedy output to
    the uniform-length path on the same effective prompt — so interact /
    run_test can reuse compiled programs across prompt lengths."""
    cfg, params, _ = setup
    rng = np.random.default_rng(5)
    true_len, bucket, cap = 6, 12, 20
    prompt = rng.integers(0, 50, (true_len,))
    uni_ids = jnp.asarray(prompt[None], jnp.int32)
    ref = jax.jit(lambda p, i: speculative_generate(
        p, cfg, i, true_len, max_len=cap, eos_id=EOS, sp2_id=SP2,
        draft_layers=2, gamma=3, greedy=True,
        rng=jax.random.PRNGKey(0)))(params, uni_ids)

    pad_ids = np.full((1, bucket), EOS, np.int32)
    pad_ids[0, bucket - true_len:] = prompt
    mask = np.zeros((1, bucket), np.float32)
    mask[0, bucket - true_len:] = 1.0
    got = jax.jit(lambda p, i, m: speculative_generate(
        p, cfg, i, max_len=cap, eos_id=EOS, sp2_id=SP2,
        draft_layers=2, gamma=3, greedy=True, prompt_mask=m,
        max_new_tokens=cap - true_len,
        rng=jax.random.PRNGKey(0)))(params, jnp.asarray(pad_ids),
                                    jnp.asarray(mask))

    rl = int(ref.lengths[0])
    ref_cont = np.asarray(ref.tokens[0, true_len:rl])
    gl = int(got.lengths[0])
    got_cont = np.asarray(got.tokens[0, bucket:gl])
    np.testing.assert_array_equal(ref_cont, got_cont)


def test_generate_batch_routes_to_speculative(setup):
    """generate_batch(draft_layers=K) on a B=1 request produces the same
    greedy continuation as the standard path — the user-facing switch
    (infer/interact --draft_layers) changes speed, not output."""
    from ergm_tpu.infer.generate import generate_batch

    cfg, params, _ = setup
    prompt = [3, 7, 11, 2, 9]
    kw = dict(max_len=30, eos_id=EOS, sp2_id=SP2, greedy=True,
              max_new_tokens=8, rng=jax.random.PRNGKey(0))
    base, base_emo = generate_batch(params, cfg, [prompt], **kw)
    spec, spec_emo = generate_batch(params, cfg, [prompt], draft_layers=2,
                                    spec_gamma=3, **kw)
    assert spec == base
    np.testing.assert_allclose(np.asarray(base_emo), np.asarray(spec_emo),
                               atol=1e-5)


def test_generate_batch_spec_falls_back_on_batch(setup):
    from ergm_tpu.infer.generate import generate_batch

    cfg, params, _ = setup
    kw = dict(max_len=20, eos_id=EOS, sp2_id=SP2, greedy=True,
              max_new_tokens=4, rng=jax.random.PRNGKey(0))
    with pytest.warns(UserWarning, match="B=1"):
        outs, _ = generate_batch(params, cfg, [[1, 2], [3, 4]],
                                 draft_layers=2, **kw)
    assert len(outs) == 2

# -- prompt-lookup (n-gram) drafting -----------------------------------


@pytest.mark.parametrize("gamma", [1, 3])
@pytest.mark.parametrize("ngram_n", [1, 2, 3])
def test_greedy_ngram_identical_to_greedy_decode(setup, gamma, ngram_n):
    """mode='ngram' greedy output is byte-identical to plain greedy for
    any n-gram length / gamma — lookup quality changes speed only."""
    cfg, params, ids = setup
    cap = 24
    ref = jax.jit(lambda p, i: generate(
        p, cfg, i, 8, max_len=cap, eos_id=EOS, sp2_id=SP2,
        greedy=True, rng=jax.random.PRNGKey(0)))(params, ids)
    got = jax.jit(lambda p, i: speculative_generate(
        p, cfg, i, 8, max_len=cap, eos_id=EOS, sp2_id=SP2,
        mode="ngram", ngram_n=ngram_n, gamma=gamma, greedy=True,
        rng=jax.random.PRNGKey(0)))(params, ids)
    rl, gl = int(ref.lengths[0]), int(got.lengths[0])
    assert gl == rl, (np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.tokens[0, :rl]),
                                  np.asarray(got.tokens[0, :gl]))


def test_sampling_ngram_marginal_matches_direct():
    """Delta-proposal rejection (accept x w.p. p(x); residual = p minus
    x renormalized) preserves the nucleus-filtered target distribution."""
    cfg = make_cfg(vocab_size=16, n_embd=16, n_head=2, n_layer=2)
    params = gpt2.init_params(jax.random.PRNGKey(2), cfg)
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    n, cap = 400, 7

    def batch_counts(fn):
        counts = np.zeros(16)
        for s in range(n):
            out = fn(jax.random.PRNGKey(1000 + s))
            toks = np.asarray(out.tokens[0])
            counts[toks[5]] += 1  # position Lp+1: first speculated slot
        return counts / n

    direct_fn = jax.jit(lambda k: generate(
        params, cfg, ids, 4, max_len=cap, eos_id=15, sp2_id=14, top_p=0.9,
        sample_top_k=0, rng=k))
    spec_fn = jax.jit(lambda k: speculative_generate(
        params, cfg, ids, 4, max_len=cap, eos_id=15, sp2_id=14, top_p=0.9,
        mode="ngram", ngram_n=2, gamma=2, rng=k))
    direct = batch_counts(direct_fn)
    spec = batch_counts(spec_fn)
    tv = 0.5 * np.abs(direct - spec).sum()
    assert tv < 0.15, (tv, direct, spec)


def test_ngram_accepts_on_repetitive_continuation():
    """On a model overfit to repeat a period-4 token loop, the lookup
    draft hits every time: acceptance per macro step approaches gamma."""
    import optax

    cfg = make_cfg(n_layer=2, n_embd=32)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    seq = np.tile([7, 12, 23, 31], 12)[:40]  # period-4 loop
    batch_ids = jnp.asarray(seq[None], jnp.int32)
    # forward shifts labels internally (reference src/model.py:704-713)
    labels = batch_ids
    # sp2 token types EVERYWHERE: the decode loop tags generated tokens
    # with sp2, so the toy must be trained under the same conditioning
    # or greedy decode walks off the memorized loop
    tts = jnp.full_like(batch_ids, SP2)

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = gpt2.forward(p, cfg, batch_ids, token_type_ids=tts,
                               labels=labels)
            return out.loss
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(150):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5, float(loss)

    out, (accepted, steps, _) = jax.jit(
        lambda p: speculative_stats(
            p, cfg, batch_ids[:, :16], 16, max_len=40, eos_id=EOS,
            sp2_id=SP2, token_type_ids=tts[:, :16],
            mode="ngram", ngram_n=3, gamma=4, greedy=True,
            rng=jax.random.PRNGKey(0)))(params)
    acc_per_step = float(accepted) / max(float(steps), 1.0)
    assert acc_per_step > 2.0, (float(accepted), float(steps))


def test_ngram_masked_leftpad_matches_uniform(setup):
    cfg, params, _ = setup
    rng = np.random.default_rng(5)
    true_len, bucket, cap = 6, 12, 20
    prompt = rng.integers(0, 50, (true_len,))
    uni_ids = jnp.asarray(prompt[None], jnp.int32)
    ref = jax.jit(lambda p, i: speculative_generate(
        p, cfg, i, true_len, max_len=cap, eos_id=EOS, sp2_id=SP2,
        mode="ngram", ngram_n=2, gamma=3, greedy=True,
        rng=jax.random.PRNGKey(0)))(params, uni_ids)

    pad_ids = np.full((1, bucket), EOS, np.int32)
    pad_ids[0, bucket - true_len:] = prompt
    mask = np.zeros((1, bucket), np.float32)
    mask[0, bucket - true_len:] = 1.0
    got = jax.jit(lambda p, i, m: speculative_generate(
        p, cfg, i, max_len=cap, eos_id=EOS, sp2_id=SP2,
        mode="ngram", ngram_n=2, gamma=3, greedy=True, prompt_mask=m,
        max_new_tokens=cap - true_len,
        rng=jax.random.PRNGKey(0)))(params, jnp.asarray(pad_ids),
                                    jnp.asarray(mask))

    rl = int(ref.lengths[0])
    ref_cont = np.asarray(ref.tokens[0, true_len:rl])
    gl = int(got.lengths[0])
    got_cont = np.asarray(got.tokens[0, bucket:gl])
    np.testing.assert_array_equal(ref_cont, got_cont)


def test_generate_batch_routes_to_ngram(setup):
    """generate_batch(spec_mode='ngram') with draft_layers=0 reaches the
    lookup path and matches the standard greedy output."""
    from ergm_tpu.infer.generate import generate_batch

    cfg, params, _ = setup
    prompt = [3, 7, 11, 2, 9]
    kw = dict(max_len=30, eos_id=EOS, sp2_id=SP2, greedy=True,
              max_new_tokens=8, rng=jax.random.PRNGKey(0))
    base, base_emo = generate_batch(params, cfg, [prompt], **kw)
    spec, spec_emo = generate_batch(params, cfg, [prompt], spec_mode="ngram",
                                    spec_ngram=2, spec_gamma=3, **kw)
    assert spec == base
    np.testing.assert_allclose(np.asarray(base_emo), np.asarray(spec_emo),
                               atol=1e-5)


def test_spec_mode_validation(setup):
    cfg, params, ids = setup
    with pytest.raises(ValueError, match="mode"):
        speculative_generate(params, cfg, ids, 8, max_len=20, eos_id=EOS,
                             sp2_id=SP2, mode="nope")
    with pytest.raises(ValueError, match="ngram_n"):
        speculative_generate(params, cfg, ids, 8, max_len=20, eos_id=EOS,
                             sp2_id=SP2, mode="ngram", ngram_n=0)


def test_spec_mode_auto_policy(setup, monkeypatch):
    """spec_mode='auto' (the default; VERDICT r4 #8) applies the
    measured rule: greedy B=1 single-device routes to prompt-lookup
    drafting; sampled (or batched) requests stay on the plain path."""
    import ergm_tpu.infer.generate as G

    cfg, params, _ = setup
    calls = []
    real = G._jitted_speculative

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(G, "_jitted_speculative", spy)
    prompt = [3, 7, 11, 2, 9]
    kw = dict(max_len=30, eos_id=EOS, sp2_id=SP2, max_new_tokens=8,
              rng=jax.random.PRNGKey(0))
    # greedy B=1: spec on (exact — must match an explicit plain decode)
    auto, _ = G.generate_batch(params, cfg, [prompt], greedy=True, **kw)
    assert len(calls) == 1
    plain, _ = G.generate_batch(params, cfg, [prompt], greedy=True,
                                spec_mode="none", **kw)
    assert len(calls) == 1 and auto == plain
    # sampled: spec off
    G.generate_batch(params, cfg, [prompt], greedy=False, **kw)
    assert len(calls) == 1
    # greedy B=2: spec off (B=1-only path)
    G.generate_batch(params, cfg, [prompt, prompt], greedy=True, **kw)
    assert len(calls) == 1
