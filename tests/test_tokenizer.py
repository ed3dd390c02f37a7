"""Tokenizer tests: byte-level BPE roundtrip, GPT-2 file-format parity
with HF GPT2Tokenizer on the same trained files, special-token handling."""

import numpy as np
import pytest

from ergm_tpu.core.tokens import ADDITIONAL_SPECIAL_TOKENS, EOS_TOKEN
from ergm_tpu.tokenizer.bpe import BPETokenizer, train_bpe

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "I don't think that's right, she said.",
    "Empathetic response generation with multimodal features!",
    "How are you feeling today? I'm feeling great.",
    "Numbers like 123 and 42 should tokenize too.",
] * 3


@pytest.fixture(scope="module")
def tok():
    return train_bpe(CORPUS, vocab_size=400)


def test_roundtrip(tok):
    for text in CORPUS[:5]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_roundtrip_unicode(tok):
    text = "naïve café — emoji 😀 and ünïcode"
    assert tok.decode(tok.encode(text)) == text


def test_special_tokens_roundtrip(tok):
    tok.add_special_tokens(ADDITIONAL_SPECIAL_TOKENS)
    text = "<bos><sp1>hello there<sp2>general kenobi" + EOS_TOKEN
    ids = tok.encode(text)
    assert tok.vocab["<bos>"] == ids[0]
    assert ids[-1] == tok.eos_id
    assert tok.decode(ids) == text
    stripped = tok.decode(ids, skip_special_tokens=True)
    assert stripped == "hello theregeneral kenobi"


def test_special_tokens_are_atomic(tok):
    tok.add_special_tokens(ADDITIONAL_SPECIAL_TOKENS)
    ids = tok.encode("<sp1>")
    assert ids == [tok.vocab["<sp1>"]]


def test_hf_gpt2_format_parity(tok, tmp_path):
    """Files we write load into HF GPT2Tokenizer and produce identical
    encodings — proving GPT-2 vocab.json/merges.txt compatibility."""
    transformers = pytest.importorskip("transformers")
    tok.save(str(tmp_path))
    hf = transformers.GPT2Tokenizer(
        vocab_file=str(tmp_path / "vocab.json"),
        merges_file=str(tmp_path / "merges.txt"),
        unk_token=EOS_TOKEN, bos_token=EOS_TOKEN, eos_token=EOS_TOKEN,
    )
    for text in ["The quick brown fox jumps.", "I don't think so!",
                 "feeling great today", "42 numbers 123"]:
        ours = tok.encode(text)
        theirs = hf.encode(text)
        assert ours == theirs, (text, ours, theirs)
        assert tok.decode(ours) == hf.decode(theirs)


def test_save_load_roundtrip(tok, tmp_path):
    tok.add_special_tokens(ADDITIONAL_SPECIAL_TOKENS)
    tok.save(str(tmp_path / "t"))
    tok2 = BPETokenizer.load(str(tmp_path / "t"))
    assert tok2.vocab == tok.vocab
    text = "<bos><sp1>hello world" + EOS_TOKEN
    assert tok2.encode(text) == tok.encode(text)
