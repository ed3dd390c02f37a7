"""Golden parity against the REFERENCE's own model code.

Imports /root/reference/src/model.py directly (read-only; with shims for
its hard-coded CUDA placement, src/model.py:401-408, and for HF symbols
removed since the transformers version it vendored), random-initializes
it, converts the state dict, and requires our model to match:

- logits with caption cross-attention active (the reference's only
  runnable path — without captions its forward hits the §2.4.2
  NameError, which a test below pins down as documented),
- emotion logits from the final position (strict parity mode),
- the joint LM + emotion loss (src/model.py:703-713).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference/src"


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


VOCAB, POS, EMBD, LAYER, HEAD = 96, 64, 32, 2, 4


def _build(refmodel):
    cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=POS, n_embd=EMBD, n_layer=LAYER,
        n_head=HEAD, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    m = refmodel.GPT2LMHeadModel(cfg)
    m.eval()
    from ergm_tpu.core.config import ModelConfig
    from ergm_tpu.models.convert import hf_to_params

    ours_cfg = ModelConfig(vocab_size=VOCAB, n_positions=POS, n_embd=EMBD,
                           n_layer=LAYER, n_head=HEAD, use_cross_attention=True,
                           dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                           resid_pdrop=0.0)
    params = hf_to_params(m.state_dict(), ours_cfg)
    return m, ours_cfg, params


def test_logits_emotion_and_loss_parity(refmodel):
    from ergm_tpu.models import gpt2

    m, cfg, params = _build(refmodel)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, (2, 10))
    tts = rng.integers(0, VOCAB, (2, 10))
    caps = rng.integers(0, VOCAB, (2, 10))  # reference reshapes captions to
    # the input length (model.py:461), so same shape
    labels = ids.copy()
    labels[:, :4] = -100
    emo = np.array([2, 6])

    with torch.no_grad():
        ref_out = m(input_ids=torch.tensor(ids), token_type_ids=torch.tensor(tts),
                    caption_ids=torch.tensor(caps), labels=torch.tensor(labels),
                    emotion_labels=torch.tensor(emo))
    out = gpt2.forward(params, cfg, jnp.asarray(ids),
                       token_type_ids=jnp.asarray(tts),
                       caption_ids=jnp.asarray(caps),
                       labels=jnp.asarray(labels),
                       emotion_labels=jnp.asarray(emo))

    np.testing.assert_allclose(np.asarray(out.logits), ref_out.logits.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.emotion_logits),
                               ref_out.emotion_logits.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(float(out.loss), float(ref_out.loss), rtol=1e-4)


def test_reference_crashes_without_captions_we_dont(refmodel):
    """SURVEY.md §2.4.2: the reference's published train path cannot run
    (caption_embeds unbound); our cross-attention is optional instead."""
    from ergm_tpu.models import gpt2

    m, cfg, params = _build(refmodel)
    ids = torch.tensor([[1, 2, 3, 4]])
    with pytest.raises(UnboundLocalError):
        with torch.no_grad():
            m(input_ids=ids)
    out = gpt2.forward(params, cfg, jnp.asarray(ids.numpy()))
    assert np.isfinite(np.asarray(out.logits)).all()
