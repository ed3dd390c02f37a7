"""Head pruning parity vs HF torch, and the text-feature extractor."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.models import gpt2

VOCAB, EMBD, LAYER, HEAD = 96, 32, 2, 4


def test_prune_heads_matches_hf():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ergm_tpu.models.convert import hf_to_params

    hf_cfg = transformers.GPT2Config(
        vocab_size=VOCAB, n_positions=64, n_embd=EMBD, n_layer=LAYER, n_head=HEAD,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg)
    hf.eval()

    cfg = ModelConfig(vocab_size=VOCAB, n_positions=64, n_embd=EMBD,
                      n_layer=LAYER, n_head=HEAD, use_cross_attention=False,
                      dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    params = hf_to_params(hf.state_dict(), cfg)

    to_prune = {0: [1], 1: [2]}
    hf.transformer._prune_heads(to_prune)
    pruned, pcfg = gpt2.prune_heads(params, cfg, to_prune)
    assert pcfg.n_head == HEAD - 1
    assert pcfg.head_dim == EMBD // HEAD

    ids = np.random.default_rng(0).integers(0, VOCAB, (2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    out = gpt2.forward(pruned, pcfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out.logits), ref, atol=1e-3, rtol=1e-3)


def test_prune_heads_uniform_requirement():
    cfg = ModelConfig(vocab_size=VOCAB, n_positions=64, n_embd=EMBD,
                      n_layer=LAYER, n_head=HEAD, use_cross_attention=False,
                      dtype="float32")
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        gpt2.prune_heads(params, cfg, {0: [1], 1: [2, 3]})


def test_text_features(tmp_path):
    from ergm_tpu.tools.text_features import extract_text_features, main

    cfg = ModelConfig(vocab_size=VOCAB, n_positions=64, n_embd=EMBD,
                      n_layer=LAYER, n_head=HEAD, use_cross_attention=False,
                      dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    utts = [[1, 2, 3], [4, 5, 6, 7, 8], [9]]
    feats = extract_text_features(params, cfg, utts, batch_size=2, pad_multiple=8)
    assert len(feats) == 3 and feats[0].shape == (EMBD,)
    # mean over real tokens only: a single-utterance run must agree
    solo = extract_text_features(params, cfg, [utts[1]], batch_size=1, pad_multiple=8)
    np.testing.assert_allclose(feats[1], solo[0], rtol=1e-5, atol=1e-6)
