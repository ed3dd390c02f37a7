"""Native (C++) BPE kernel: availability, parity with the Python merge
loop, and a sanity speed check on corpus-scale input."""

import time

import pytest

from ergm_tpu.tokenizer.bpe import BPETokenizer, train_bpe

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "I don't think that's right, she said loudly.",
    "Empathetic response generation with multimodal features!",
    "Numbers like 123 and 42 should tokenize too.",
] * 4


@pytest.fixture(scope="module")
def trained():
    return train_bpe(CORPUS, vocab_size=500)


def _clone(tok, use_native):
    merges = [m for m, _ in sorted(tok.merge_ranks.items(), key=lambda kv: kv[1])]
    return BPETokenizer(tok.vocab, merges, use_native=use_native)


def test_native_builds_and_loads(trained):
    nat = _clone(trained, use_native=True)
    if nat._native is None:
        pytest.skip("native BPE library unavailable (no compiler?)")
    assert nat._native.available


def test_native_matches_python(trained):
    nat = _clone(trained, use_native=True)
    if nat._native is None:
        pytest.skip("native BPE library unavailable")
    py = _clone(trained, use_native=False)
    texts = CORPUS + ["unseen wordz zzz qqq", "naïve café 😀", "a", "", "   "]
    for text in texts:
        assert nat.encode(text) == py.encode(text), text


def test_native_faster_on_cold_cache(trained):
    nat = _clone(trained, use_native=True)
    if nat._native is None:
        pytest.skip("native BPE library unavailable")
    py = _clone(trained, use_native=False)
    # synthetic corpus with many distinct words (cache misses dominate)
    words = [f"word{i}variant{i * 7 % 97}" for i in range(3000)]
    text = " ".join(words)

    t0 = time.perf_counter()
    a = nat.encode(text)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = py.encode(text)
    t_py = time.perf_counter() - t0
    assert a == b
    # Speed is advisory on a loaded 1-core CI box: the hard assertion only
    # guards against a pathological slowdown. Typical: ~2.3x faster.
    print(f"native {t_nat:.3f}s vs python {t_py:.3f}s "
          f"({t_py / max(t_nat, 1e-9):.2f}x)")
    assert t_nat < t_py * 3.0, f"native pathologically slow: {t_nat:.3f}s vs {t_py:.3f}s"
