"""Interactive dialogue session mechanics + the REPL loop."""

import io

import jax
import pytest

from ergm_tpu.core.config import ModelConfig
from ergm_tpu.core.tokens import SpecialTokens
from ergm_tpu.infer.interact import DialogueSession, run_repl
from ergm_tpu.models import gpt2
from ergm_tpu.tokenizer.bpe import train_bpe


@pytest.fixture(scope="module")
def setup():
    tok = train_bpe(["hello there how are you doing today my friend"] * 3,
                    vocab_size=300)
    vocab = dict(tok.vocab)
    st = SpecialTokens.register(vocab)
    tok.add_special_tokens([t for t in vocab if t not in tok.vocab])
    cfg = ModelConfig(vocab_size=st.vocab_size, n_positions=64, n_embd=32,
                      n_layer=2, n_head=4, use_cross_attention=False,
                      dtype="float32", embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg, st, tok


def test_session_reply_and_history(setup):
    params, cfg, st, tok = setup
    s = DialogueSession(params, cfg, st, tok, max_len=64, top_p=0.9, seed=0)
    reply = s.reply("hello there", max_new_tokens=6)
    assert isinstance(reply, str)
    assert len(s.turns) == 2  # user + model
    s.reply("how are you", max_new_tokens=6)
    assert len(s.turns) == 4


def test_session_max_turns_truncation(setup):
    params, cfg, st, tok = setup
    s = DialogueSession(params, cfg, st, tok, max_len=64, max_turns=2, seed=0)
    for _ in range(3):
        s.reply("hello there today", max_new_tokens=4)
    # window stays bounded: prompt assembled from at most 2 turns
    prompt, tts = s._window()
    assert len(prompt) < 64 and len(tts) == len(prompt)
    assert set(tts) <= {st.sp1_id, st.sp2_id}


def test_repl_loop(setup):
    params, cfg, st, tok = setup
    out = io.StringIO()
    run_repl(params, cfg, st, tok, max_len=64,
             stdin=io.StringIO("hello there\n\n"), stdout=out)
    text = out.getvalue()
    assert "model>" in text and "bye." in text


def test_repl_speculative(setup):
    """--draft_layers wiring: the REPL serves replies through the
    self-speculative B=1 path without changing the session contract."""
    params, cfg, st, tok = setup
    out = io.StringIO()
    run_repl(params, cfg, st, tok, max_len=64, draft_layers=1, spec_gamma=2,
             stdin=io.StringIO("hello there\n\n"), stdout=out)
    text = out.getvalue()
    assert "model>" in text and "bye." in text
    assert "[error" not in text
