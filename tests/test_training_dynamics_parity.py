"""Multi-step TRAINING-DYNAMICS parity against the reference's own code.

The existing golden tests pin single-forward logits/loss parity
(tests/test_reference_parity.py) and schedule parity in isolation
(tests/test_train.py::test_schedule_matches_hf_torch). This test closes
the remaining gap: run the reference's actual optimization recipe —
torch.optim.AdamW at defaults (src/main.py:68) + HF polynomial-decay
warmup schedule, power=2 (src/main.py:93-95) + the train-loop order
zero_grad/backward/step/sched.step (src/main.py:153-156) — for N steps
on identical data from identical init, against our jitted train step
(optax.adamw + ergm_tpu.train.schedule), and require the per-step joint
losses and the post-training logits to track.

This is what catches optimizer-semantics drift that single-step tests
cannot: AdamW decoupled-decay placement, bias correction, eps inside
vs outside the sqrt, schedule step-count offsets, and gradient flow
through the tied wte/lm_head and the caption cross-attention path.

Dropout is 0 on both sides (the reference's only deterministic config);
fp32 everywhere.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/src"

VOCAB, POS, EMBD, LAYER, HEAD = 96, 64, 32, 2, 4
B, L, N_STEPS = 4, 16, 8
LR, WARMUP, TOTAL = 5e-4, 2, N_STEPS


@pytest.fixture(scope="module")
def refmodel():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    import transformers.modeling_utils as mu

    if not hasattr(mu, "SequenceSummary"):
        mu.SequenceSummary = object  # imported but unused by the reference
    orig_to = torch.nn.Module.to

    def patched_to(self, *args, **kwargs):
        if args and str(args[0]).startswith("cuda"):
            return self  # neutralize hard-coded .to("cuda"), model.py:401-407
        return orig_to(self, *args, **kwargs)

    torch.nn.Module.to = patched_to
    torch.cuda.empty_cache = lambda: None
    sys.path.insert(0, REF)
    try:
        import model as ref

        yield ref
    finally:
        sys.path.remove(REF)
        torch.nn.Module.to = orig_to


def _build(refmodel):
    cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=POS, n_embd=EMBD, n_layer=LAYER,
        n_head=HEAD, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    m = refmodel.GPT2LMHeadModel(cfg)
    m.train()
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models.convert import hf_to_params

    ours_cfg = ModelConfig(vocab_size=VOCAB, n_positions=POS, n_embd=EMBD,
                           n_layer=LAYER, n_head=HEAD, use_cross_attention=True,
                           dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                           resid_pdrop=0.0)
    params = hf_to_params(m.state_dict(), ours_cfg)
    return m, ours_cfg, params


def _batches(n):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        ids = rng.integers(0, VOCAB, (B, L))
        tts = rng.integers(0, VOCAB, (B, L))
        caps = rng.integers(0, VOCAB, (B, L))  # reference views captions at
        # the input length (model.py:461)
        labels = ids.copy()
        labels[:, : L // 4] = -100
        emo = rng.integers(0, 7, (B,))
        out.append((ids, tts, caps, labels, emo))
    return out


def test_n_step_training_dynamics_match_reference(refmodel):
    import optax

    from ergm_tpu.models import gpt2
    from ergm_tpu.train.schedule import polynomial_warmup_schedule
    from ergm_tpu.train.steps import create_train_state, make_train_step

    m, cfg, params = _build(refmodel)
    batches = _batches(N_STEPS)

    # --- reference recipe: src/main.py:68, 93-95, 153-156 ---
    optim = torch.optim.AdamW(m.parameters(), lr=LR)
    sched = transformers.get_polynomial_decay_schedule_with_warmup(
        optim, num_warmup_steps=WARMUP, num_training_steps=TOTAL, power=2)
    ref_losses = []
    for ids, tts, caps, labels, emo in batches:
        out = m(input_ids=torch.tensor(ids), token_type_ids=torch.tensor(tts),
                caption_ids=torch.tensor(caps), labels=torch.tensor(labels),
                emotion_labels=torch.tensor(emo))
        optim.zero_grad()
        out.loss.backward()
        optim.step()
        sched.step()
        ref_losses.append(float(out.loss))

    # --- ours: the real jitted train step + optax recipe the Trainer builds ---
    schedule = polynomial_warmup_schedule(LR, WARMUP, TOTAL, power=2.0)
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    # snapshot before training: the jitted step donates the state, deleting
    # the original param buffers after the first update
    wte_before = np.array(params["wte"]["embedding"])
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx)
    key = jax.random.PRNGKey(0)  # all pdrop=0: dropout is inert
    our_losses = []
    for ids, tts, caps, labels, emo in batches:
        batch = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "token_type_ids": jnp.asarray(tts, jnp.int32),
            "labels": jnp.asarray(labels, jnp.int32),
            "emotion_labels": jnp.asarray(emo, jnp.int32),
            "valid": jnp.ones((B,), bool),
            "seq_lengths": jnp.full((B,), L, jnp.int32),
            "caption_ids": jnp.asarray(caps, jnp.int32),
            "caption_mask": jnp.ones((B, L), jnp.int32),
        }
        state, metrics = step(state, batch, key)
        our_losses.append(float(metrics["loss"]))

    # per-step joint losses track through the whole run (each step sees
    # params shaped by every previous update on both sides)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)
    # and the optimizer actually moved the weights (fresh data each step +
    # warmup means the LOSS need not be monotonic — on either side)
    after = np.asarray(state.params["wte"]["embedding"])
    assert float(np.abs(after - wte_before).max()) > 1e-5

    # post-training forward parity on a held-out batch
    rng = np.random.default_rng(99)
    ids = rng.integers(0, VOCAB, (2, 12))
    tts = rng.integers(0, VOCAB, (2, 12))
    caps = rng.integers(0, VOCAB, (2, 12))
    m.eval()
    with torch.no_grad():
        ref_logits = m(input_ids=torch.tensor(ids),
                       token_type_ids=torch.tensor(tts),
                       caption_ids=torch.tensor(caps)).logits.numpy()
    out = gpt2.forward(state.params, cfg, jnp.asarray(ids),
                       token_type_ids=jnp.asarray(tts),
                       caption_ids=jnp.asarray(caps))
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits,
                               rtol=5e-3, atol=5e-3)
