"""Generation tests: top-p filter parity with the reference torch math,
eos termination, greedy-vs-full-forward equivalence, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.generate import generate, top_p_filter
from ergm_tpu.models import gpt2

CFG = ModelConfig(
    vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4,
    use_cross_attention=False, dtype="float32",
    embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
)


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(jax.random.PRNGKey(0), CFG)


def reference_top_p(probs: np.ndarray, top_p: float) -> np.ndarray:
    """Literal port of src/main.py:261-269 (numpy)."""
    sorted_idx = np.argsort(-probs, axis=-1, kind="stable")
    sorted_probs = np.take_along_axis(probs, sorted_idx, axis=-1)
    cumsum = np.cumsum(sorted_probs, axis=-1)
    idx_remove = cumsum > top_p
    idx_remove[:, 1:] = idx_remove[:, :-1].copy()
    idx_remove[:, 0] = False
    sorted_probs[idx_remove] = 0.0
    sorted_probs /= sorted_probs.sum(axis=-1, keepdims=True)
    out = np.zeros_like(probs)
    np.put_along_axis(out, sorted_idx, sorted_probs, axis=-1)
    return out


@pytest.mark.parametrize("top_p", [0.3, 0.8, 0.95, 1.0])
def test_top_p_filter_matches_reference(top_p):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 50)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ref = reference_top_p(probs.copy(), top_p)
    ours = np.asarray(top_p_filter(jnp.asarray(probs), top_p))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # result is a distribution
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)


def test_sample_top_p_stays_in_exact_nucleus():
    """The fast top-k sampler must only emit tokens the exact reference
    filter (src/main.py:261-267) would keep."""
    from ergm_tpu.infer.generate import sample_top_p

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 64)).astype(np.float32) * 4  # peaked
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    allowed = reference_top_p(probs.copy(), 0.8) > 0

    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    samples = jax.vmap(lambda k: sample_top_p(jnp.asarray(logits), k, 0.8, top_k=16))(keys)
    samples = np.asarray(samples)  # [64, 2]
    for b in range(2):
        assert all(allowed[b, s] for s in samples[:, b])


def test_top_p_mass_bound():
    rng = np.random.default_rng(1)
    probs = rng.dirichlet(np.ones(30), size=3).astype(np.float32)
    filtered = np.asarray(top_p_filter(jnp.asarray(probs), 0.7))
    for b in range(3):
        kept = filtered[b] > 0
        orig_mass = probs[b][kept].sum()
        # kept mass must exceed top_p but removing the smallest kept token
        # must drop below it (minimal covering prefix)
        assert orig_mass >= 0.7
        smallest = probs[b][kept].min()
        if kept.sum() > 1:
            assert orig_mass - smallest < 0.7 + 1e-6


def test_greedy_decode_consistency(params):
    """Greedy cached decode equals step-by-step full forward with the same
    token-type convention (prompt types none -> generated sp2)."""
    B, Lp, max_len = 2, 4, 10
    eos_id, sp2_id = CFG.vocab_size - 1, 5
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, Lp), 0, CFG.vocab_size - 1)
    tt_prompt = jnp.full((B, Lp), 3, jnp.int32)

    out = generate(params, CFG, ids, Lp, max_len=max_len,
                   eos_id=eos_id, sp2_id=sp2_id, greedy=True,
                   token_type_ids=tt_prompt, rng=jax.random.PRNGKey(0))
    tokens, lengths = out.tokens, out.lengths

    seq, tt = ids, tt_prompt
    oracle = []
    for pos in range(Lp, max_len):
        out = gpt2.forward(params, CFG, seq, token_type_ids=tt)
        nxt = jnp.argmax(out.logits[:, -1], -1)
        oracle.append(np.asarray(nxt))
        seq = jnp.concatenate([seq, nxt[:, None].astype(seq.dtype)], axis=1)
        tt = jnp.concatenate([tt, jnp.full((B, 1), sp2_id, jnp.int32)], axis=1)
    oracle = np.stack(oracle, axis=1)  # [B, gen]

    got = np.asarray(tokens[:, Lp:max_len])
    for b in range(B):
        n = int(lengths[b]) - Lp
        # compare up to this row's stop (after eos ours pads with eos)
        for t in range(n):
            assert got[b, t] == oracle[b, t], (b, t, got[b], oracle[b])


def test_eos_termination_and_lengths(params):
    """Declaring the model's first greedy pick as eos must stop the loop
    immediately (src/main.py:274) and report length prompt+1."""
    sp2_id = 5
    ids = jnp.ones((2, 3), jnp.int32)
    # discover what greedy picks first with an unused eos id
    tokens = generate(params, CFG, ids, 3, max_len=6,
                      eos_id=CFG.vocab_size - 1, sp2_id=sp2_id, greedy=True,
                      rng=jax.random.PRNGKey(0)).tokens
    first_pick = int(np.asarray(tokens)[0, 3])
    out = generate(params, CFG, ids, 3, max_len=20,
                   eos_id=first_pick, sp2_id=sp2_id, greedy=True,
                   rng=jax.random.PRNGKey(0))
    tokens, lengths = out.tokens, out.lengths
    assert int(lengths[0]) == 4
    assert int(np.asarray(tokens)[0, 3]) == first_pick
    # stopped rows are eos-filled afterwards
    assert (np.asarray(tokens)[0, 4:] == first_pick).all()


def test_generate_batch_ragged_matches_per_sample(params):
    """Left-padded batched decode must equal per-sample uniform decode
    (greedy) for every row despite different prompt lengths."""
    from ergm_tpu.infer.generate import generate_batch

    eos_id, sp2_id = CFG.vocab_size - 1, 5
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab_size - 1, n).tolist() for n in (3, 7, 5)]

    batch_out, emo = generate_batch(params, CFG, prompts, max_len=20,
                                    eos_id=eos_id, sp2_id=sp2_id, greedy=True,
                                    prompt_bucket=8, max_new_tokens=6)
    assert emo.shape == (3, CFG.num_emotions)
    for b, p in enumerate(prompts):
        solo = generate(params, CFG, jnp.asarray([p]), len(p), max_len=len(p) + 6,
                        logical_cap=20, eos_id=eos_id, sp2_id=sp2_id, greedy=True,
                        rng=jax.random.PRNGKey(0))
        want = np.asarray(solo.tokens)[0, len(p):int(solo.lengths[0])].tolist()
        assert batch_out[b] == want, (b, batch_out[b], want)


def test_generate_batch_modality_conditioning(params):
    """img/aud features must still condition left-padded rows (injection
    follows the mask to the first real positions)."""
    from ergm_tpu.infer.generate import generate_batch

    eos_id, sp2_id = CFG.vocab_size - 1, 5
    prompts = [[4, 8, 15, 16], [23, 42]]
    imgs = np.ones((2, CFG.modality_dim), np.float32) * 0.7
    auds = np.ones((2, CFG.modality_dim), np.float32) * -0.4
    with_m, _ = generate_batch(params, CFG, prompts, max_len=16, eos_id=eos_id,
                               sp2_id=sp2_id, greedy=True, prompt_bucket=8,
                               max_new_tokens=4, imgs=imgs, auds=auds)
    without, _ = generate_batch(params, CFG, prompts, max_len=16, eos_id=eos_id,
                                sp2_id=sp2_id, greedy=True, prompt_bucket=8,
                                max_new_tokens=4)
    assert with_m != without


def test_data_parallel_decode_8dev_mesh(params):
    """Batched generation sharded over the mesh data axis produces the
    same tokens as the single-device run (SPMD serving path)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ergm_tpu.core.mesh import make_mesh

    assert jax.device_count() == 8
    mesh = make_mesh((8,), ("data",))
    eos_id, sp2_id = CFG.vocab_size - 1, 5
    B, Lp = 8, 4
    ids = jax.random.randint(jax.random.PRNGKey(9), (B, Lp), 0, CFG.vocab_size - 1)

    single = generate(params, CFG, ids, Lp, max_len=10, eos_id=eos_id,
                      sp2_id=sp2_id, greedy=True, rng=jax.random.PRNGKey(0))

    sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data")))
    with mesh:
        dp = jax.jit(lambda p, i: generate(p, CFG, i, Lp, max_len=10,
                                           eos_id=eos_id, sp2_id=sp2_id,
                                           greedy=True,
                                           rng=jax.random.PRNGKey(0)))(params, sharded_ids)
    np.testing.assert_array_equal(np.asarray(dp.tokens), np.asarray(single.tokens))
    np.testing.assert_array_equal(np.asarray(dp.lengths), np.asarray(single.lengths))


def test_sampling_deterministic_given_rng(params):
    eos_id, sp2_id = CFG.vocab_size - 1, 5
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0, CFG.vocab_size - 1)
    a = generate(params, CFG, ids, 4, max_len=12, eos_id=eos_id, sp2_id=sp2_id,
                 top_p=0.9, rng=jax.random.PRNGKey(7))
    b = generate(params, CFG, ids, 4, max_len=12, eos_id=eos_id, sp2_id=sp2_id,
                 top_p=0.9, rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    c = generate(params, CFG, ids, 4, max_len=12, eos_id=eos_id, sp2_id=sp2_id,
                 top_p=0.9, rng=jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))
