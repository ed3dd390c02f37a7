"""Beam search tests: beam-1 == greedy; wide beam finds the true maximum
log-probability continuation (verified by exact batched enumeration on a
tiny vocab)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.infer.beam import beam_search
from ergm_tpu.infer.generate import generate
from ergm_tpu.models import gpt2

CFG = ModelConfig(
    vocab_size=16, n_positions=32, n_embd=16, n_layer=2, n_head=2,
    use_cross_attention=False, dtype="float32",
    embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
)
EOS = 15
SP2 = 3
PROMPT_TT = 0  # tests give prompts token-type 0, generated tokens sp2


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(jax.random.PRNGKey(42), CFG)


def _tt(ids):
    return jnp.full(ids.shape, PROMPT_TT, jnp.int32)


def test_beam1_equals_greedy(params):
    ids = jnp.asarray([[1, 4, 2, 7]])
    g = generate(params, CFG, ids, 4, max_len=9, eos_id=EOS, sp2_id=SP2, greedy=True,
                 token_type_ids=_tt(ids), rng=jax.random.PRNGKey(0))
    out = beam_search(params, CFG, ids, 4, num_beams=1, max_len=9,
                      eos_id=EOS, sp2_id=SP2, token_type_ids=_tt(ids))
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(g.tokens))
    assert int(out.lengths[0]) == int(g.lengths[0])


def test_beam1_int8_cache_scales_carried(params):
    """Beam search must carry the int8 cache's quantization scales through
    the beam expand/reorder gathers (regression: they were dropped, so
    raw float K/V were cast straight to int8, corrupting the cache)."""
    cfg_q = CFG.replace(kv_cache_dtype="int8")
    ids = jnp.asarray([[1, 4, 2, 7]])
    g = generate(params, cfg_q, ids, 4, max_len=9, eos_id=EOS, sp2_id=SP2,
                 greedy=True, token_type_ids=_tt(ids), rng=jax.random.PRNGKey(0))
    out = beam_search(params, cfg_q, ids, 4, num_beams=1, max_len=9,
                      eos_id=EOS, sp2_id=SP2, token_type_ids=_tt(ids))
    np.testing.assert_array_equal(np.asarray(out.tokens), np.asarray(g.tokens))
    assert int(out.lengths[0]) == int(g.lengths[0])


def _enumerate_scores(params, prompt, horizon=2):
    """Exact log-prob of every 'horizon'-token continuation via one
    batched forward (eos truncates: later tokens contribute 0)."""
    V, Lp = CFG.vocab_size, len(prompt)
    seqs = np.array(list(itertools.product(range(V), repeat=horizon)), np.int32)
    n = len(seqs)
    full = np.concatenate([np.tile(prompt, (n, 1)), seqs], axis=1)
    tt = np.concatenate([np.full((n, Lp), PROMPT_TT), np.full((n, horizon), SP2)],
                        axis=1).astype(np.int32)
    out = gpt2.forward(params, CFG, jnp.asarray(full), token_type_ids=jnp.asarray(tt))
    lp = np.asarray(jax.nn.log_softmax(out.logits.astype(jnp.float32), axis=-1))
    scores = lp[np.arange(n), Lp - 1, seqs[:, 0]]
    alive = seqs[:, 0] != EOS
    scores = scores + alive * lp[np.arange(n), Lp, seqs[:, 1]]
    return seqs, scores


def test_beam_finds_brute_force_optimum(params):
    """num_beams = vocab_size is exhaustive per step for horizon 2; the
    winner must match the enumerated argmax (raw-score ranking)."""
    prompt = [2, 9, 5]
    Lp, horizon = 3, 2
    ids = jnp.asarray([prompt])
    bo = beam_search(params, CFG, ids, Lp, num_beams=CFG.vocab_size,
                     max_len=Lp + horizon, eos_id=EOS, sp2_id=SP2,
                     token_type_ids=_tt(ids), length_penalty=0.0)
    b_tokens, b_len = bo.tokens, bo.lengths
    seqs, scores = _enumerate_scores(params, prompt, horizon)
    best = seqs[np.argmax(scores)].tolist()
    got = np.asarray(b_tokens)[0, Lp:Lp + horizon].tolist()
    n_got = int(b_len[0]) - Lp
    # compare up to the winner's eos (post-eos filler is eos on both sides)
    assert got[:n_got] == best[:n_got], (got, best, float(scores.max()))


def test_beam_with_modalities_and_captions(params_cross=None):
    """Beam decode conditions on img/aud features and captions."""
    cfg = CFG.replace(use_cross_attention=True, modality_dim=CFG.n_embd)
    p = gpt2.init_params(jax.random.PRNGKey(7), cfg)
    ids = jnp.asarray([[1, 2, 3]])
    # non-constant vectors: a constant feature is pure mean shift, which
    # the first LayerNorm removes exactly
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, CFG.n_embd)) * 5, jnp.float32)
    auds = jnp.asarray(rng.standard_normal((1, CFG.n_embd)) * 5, jnp.float32)
    caps = jnp.asarray([[4, 5, 6, 7]])
    bo = beam_search(p, cfg, ids, 3, num_beams=3, max_len=8, eos_id=EOS,
                     sp2_id=SP2, imgs=imgs, auds=auds, caption_ids=caps)
    assert np.asarray(bo.tokens).shape == (1, 8)
    assert int(bo.lengths[0]) >= 4
    # conditioning reaches the logits (beam tokens may coincide on a
    # 16-vocab random model whose argmax is dominated by one token)
    o1 = gpt2.forward(p, cfg, ids, imgs=imgs, auds=auds, caption_ids=caps)
    o2 = gpt2.forward(p, cfg, ids)
    assert float(jnp.abs(o1.logits - o2.logits).max()) > 0.05


def test_runner_beam_mode(tmp_path):
    """run_test with num_beams>1 produces hypotheses via beam search."""
    from ergm_tpu.data.dataset import DialogueDataset
    from ergm_tpu.data.synthetic import write_synthetic_dataset
    from ergm_tpu.infer.runner import run_test

    st = write_synthetic_dataset(str(tmp_path), prefixes=("valid",),
                                 num_dialogues=2, turns_per_dialogue=2,
                                 base_vocab_size=64)
    cfg = ModelConfig(vocab_size=st.vocab_size, n_positions=64, n_embd=16,
                      n_layer=1, n_head=2, use_cross_attention=False,
                      dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    p = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    ds = DialogueDataset("valid", str(tmp_path), sp1_id=st.sp1_id,
                         sp2_id=st.sp2_id, eos_id=st.eos_id, max_len=64)
    res = run_test(
        p, cfg, ds, batch_size=4, eos_id=st.eos_id, sp2_id=st.sp2_id,
        max_len=64, top_p=0.9, num_beams=2, max_new_tokens=4)
    hyps, refs, labels, preds = (res.hypotheses, res.references,
                                 res.true_labels, res.pred_labels)
    assert len(hyps) == len(refs) == len(labels) == len(preds) == len(ds)
    assert len(res.contexts) == len(ds)


def test_beam_scores_improve_over_greedy(params):
    """4-beam sequence log-prob >= greedy's, computed by the same
    enumeration scorer."""
    prompt = [1, 8, 3, 3]
    ids = jnp.asarray([prompt])
    horizon = 2
    g = generate(params, CFG, ids, 4, max_len=4 + horizon, eos_id=EOS, sp2_id=SP2,
                 greedy=True, token_type_ids=_tt(ids), rng=jax.random.PRNGKey(0))
    bo = beam_search(params, CFG, ids, 4, num_beams=4,
                     max_len=4 + horizon, eos_id=EOS, sp2_id=SP2,
                     token_type_ids=_tt(ids), length_penalty=0.0)
    b_tokens, b_len = bo.tokens, bo.lengths
    seqs, scores = _enumerate_scores(params, prompt, horizon)
    lookup = {tuple(s): float(v) for s, v in zip(seqs.tolist(), scores)}

    def seq_score(tokens, length):
        seq = np.asarray(tokens)[0, 4:4 + horizon].tolist()
        n = min(int(length) - 4, horizon)
        # pad truncated sequences with eos for lookup (post-eos ignored)
        full = tuple((seq[:n] + [EOS] * horizon)[:horizon])
        return lookup[full]

    assert seq_score(b_tokens, b_len[0]) >= seq_score(g.tokens, g.lengths[0]) - 1e-5


def test_batched_ragged_beam_matches_per_sample(params):
    """The batched left-padded beam path must reproduce the per-sample
    uniform-length results exactly (VERDICT r1 item 9)."""
    from ergm_tpu.infer.beam import beam_search_batch

    prompts = [[1, 4, 2, 7], [2, 9, 5], [1, 8, 3, 3, 6, 1], [5]]
    horizon = 4
    # per-sample references (uniform mode, one call per prompt)
    want = []
    for p in prompts:
        ids = jnp.asarray([p])
        bo = beam_search(params, CFG, ids, len(p), num_beams=3,
                         max_len=len(p) + horizon, eos_id=EOS, sp2_id=SP2,
                         token_type_ids=_tt(ids))
        want.append(np.asarray(bo.tokens)[0, len(p):int(bo.lengths[0])].tolist())
    # one batched call over the ragged batch
    got, emo = beam_search_batch(
        params, CFG, prompts, num_beams=3, max_len=CFG.n_positions,
        eos_id=EOS, sp2_id=SP2,
        token_types=[[PROMPT_TT] * len(p) for p in prompts],
        max_new_tokens=horizon)
    assert got == want, (got, want)
    assert emo.shape == (4, CFG.num_emotions)


def test_beam_batch_mesh_matches_single_device():
    """beam_search_batch under a data x model mesh (batch padded to the
    data-axis multiple) returns the same continuations as meshless."""
    from ergm_tpu.core.mesh import make_mesh, shard_params
    from ergm_tpu.infer.beam import beam_search_batch

    cfg = ModelConfig(vocab_size=64, n_positions=64, n_embd=32, n_layer=2,
                      n_head=4, use_cross_attention=False, dtype="float32",
                      embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    p = gpt2.init_params(jax.random.PRNGKey(3), cfg)
    prompts = [[1, 8, 3], [2, 5, 9, 11], [7, 4]]  # 3 rows -> padded to 4
    kw = dict(num_beams=2, max_len=24, eos_id=60, sp2_id=61,
              max_new_tokens=5)
    base, base_emo = beam_search_batch(p, cfg, prompts, **kw)

    mesh = make_mesh((2, 2), ("data", "model"))
    sp = shard_params(p, mesh)
    got, got_emo = beam_search_batch(sp, cfg, prompts, mesh=mesh, **kw)
    assert got == base
    assert got_emo.shape == base_emo.shape == (3, cfg.num_emotions)
