"""Golden parity tests vs the torch/HF GPT-2 the reference vendors.

The reference model (src/model.py) is HF transformers GPT-2 with forced
cross-attention, multimodal injection, and an emotion head. These tests
build an HF GPT2LMHeadModel locally (random init — no network), convert
its weights with ergm_tpu.models.convert, and require logits to match to
<=1e-3 (SURVEY.md §7.4 parity bar) in fp32 parity mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2
from ergm_tpu.models.convert import hf_to_params, params_to_hf

VOCAB, POS, EMBD, LAYER, HEAD = 128, 64, 32, 2, 4


def make_hf(add_cross):
    cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=POS, n_embd=EMBD, n_layer=LAYER, n_head=HEAD,
        add_cross_attention=add_cross, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg)
    model.eval()
    return model


def make_cfg(use_cross):
    return ModelConfig(
        vocab_size=VOCAB, n_positions=POS, n_embd=EMBD, n_layer=LAYER, n_head=HEAD,
        use_cross_attention=use_cross, dtype="float32",
        embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
    )


def test_logits_parity_plain():
    hf = make_hf(add_cross=False)
    cfg = make_cfg(use_cross=False)
    params = hf_to_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, (2, 12))
    tt = rng.integers(0, VOCAB, (2, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), token_type_ids=torch.tensor(tt)).logits.numpy()
    out = gpt2.forward(params, cfg, jnp.asarray(ids), token_type_ids=jnp.asarray(tt))
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=1e-3, rtol=1e-3)


def test_logits_parity_cross_attention():
    hf = make_hf(add_cross=True)
    cfg = make_cfg(use_cross=True)
    params = hf_to_params(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, (2, 10))
    enc = rng.standard_normal((2, 6, EMBD)).astype(np.float32)
    enc_mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=np.float32)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).logits.numpy()
    out = gpt2.forward(
        params, cfg, jnp.asarray(ids),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask),
    )
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=1e-3, rtol=1e-3)


def test_joint_loss_parity():
    """Joint LM+emotion loss matches the reference math (src/model.py:703-713)
    including -100 ignore handling."""
    hf = make_hf(add_cross=False)
    cfg = make_cfg(use_cross=False)
    params = hf_to_params(hf.state_dict(), cfg)
    # attach a known emotion head
    torch.manual_seed(3)
    emo_w = torch.randn(cfg.num_emotions, EMBD) * 0.02
    params["emotion_head"] = {"kernel": jnp.asarray(emo_w.numpy().T)}

    rng = np.random.default_rng(2)
    ids = rng.integers(0, VOCAB, (2, 9))
    labels = ids.copy()
    labels[:, :5] = -100
    emo_labels = np.array([2, 6])

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids))
        hidden = hf_out.logits  # not hidden; recompute hidden via transformer
        h = hf.transformer(input_ids=torch.tensor(ids)).last_hidden_state
        emo_logits = h[:, -1, :] @ emo_w.T
        shift_logits = hf_out.logits[..., :-1, :].contiguous()
        shift_labels = torch.tensor(labels)[..., 1:].contiguous()
        lm_loss = torch.nn.CrossEntropyLoss()(
            shift_logits.view(-1, VOCAB), shift_labels.view(-1))
        emo_loss = torch.nn.CrossEntropyLoss()(emo_logits, torch.tensor(emo_labels))
        ref_loss = float(lm_loss + emo_loss)

    out = gpt2.forward(params, cfg, jnp.asarray(ids),
                       labels=jnp.asarray(labels), emotion_labels=jnp.asarray(emo_labels))
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-4)


def test_state_dict_roundtrip():
    cfg = make_cfg(use_cross=True)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_hf(params, cfg)
    params2 = hf_to_params(sd, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2)


def test_vocab_resize_on_convert():
    """Converting a pretrained-size checkpoint into a config with added
    special tokens appends fresh wte rows (reference: src/main.py:63)."""
    hf = make_hf(add_cross=False)
    cfg = make_cfg(use_cross=False).replace(vocab_size=VOCAB + 3)
    params = hf_to_params(hf.state_dict(), cfg, rng=jax.random.PRNGKey(0))
    assert params["wte"]["embedding"].shape[0] == VOCAB + 3
    np.testing.assert_array_equal(
        np.asarray(params["wte"]["embedding"][:VOCAB]),
        hf.state_dict()["transformer.wte.weight"].numpy())
