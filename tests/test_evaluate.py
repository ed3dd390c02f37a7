"""Evaluator tests: distinct-n reference math, BERTScore over a synthetic
embedder, the 4-argument evaluate_all surface (SURVEY.md §2.4.4 fix)."""

import math

import numpy as np
import pytest

from ergm_tpu.evaluation.evaluate import (Evaluator, bertscore_from_embeddings,
                                          calculate_distinct, word_tokenize)


def test_distinct_basic():
    d1, d2 = calculate_distinct(["a b c", "a b d"])
    # tokens: a b c a b d -> 4 unique of 6; bigrams: (a,b)x2,(b,c),(b,d) -> 3 of 4
    assert d1 == pytest.approx(4 / 6)
    assert d2 == pytest.approx(3 / 4)


def test_distinct_empty():
    assert calculate_distinct([]) == (0.0, 0.0)
    assert calculate_distinct([""]) == (0.0, 0.0)


def test_word_tokenize_contractions():
    toks = word_tokenize("i don't think that's right.")
    assert "." in toks
    assert any("n't" in t or "not" in t for t in toks)


def test_bertscore_identity():
    emb = np.random.default_rng(0).standard_normal((5, 8))
    p, r, f1 = bertscore_from_embeddings(emb, emb)
    assert p == pytest.approx(1.0, abs=1e-6)
    assert r == pytest.approx(1.0, abs=1e-6)
    assert f1 == pytest.approx(1.0, abs=1e-6)


def test_bertscore_asymmetric():
    rng = np.random.default_rng(1)
    hyp = rng.standard_normal((3, 8))
    ref = np.concatenate([hyp, rng.standard_normal((4, 8))], axis=0)
    p, r, f1 = bertscore_from_embeddings(hyp, ref)
    # every hyp token matches itself in ref -> precision 1; recall < 1
    assert p == pytest.approx(1.0, abs=1e-6)
    assert r < 1.0
    assert 0 < f1 < 1.0


def test_bleu_perfect_and_disjoint():
    from ergm_tpu.evaluation.evaluate import calculate_bleu

    assert calculate_bleu(["the cat sat on the mat today ok"],
                          ["the cat sat on the mat today ok"]) == pytest.approx(1.0)
    assert calculate_bleu(["aa bb cc dd"], ["xx yy zz ww"]) == pytest.approx(0.0)
    assert calculate_bleu([], []) == 0.0


def test_bleu_matches_nltk_when_available():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    from ergm_tpu.evaluation.evaluate import calculate_bleu, word_tokenize

    hyps = ["the cat sat on a mat", "how are you doing today my friend"]
    refs = ["the cat sat on the mat", "how are you feeling today friend"]
    ours = calculate_bleu(hyps, refs)
    ref_tok = [[word_tokenize(r.lower())] for r in refs]
    hyp_tok = [word_tokenize(h.lower()) for h in hyps]
    theirs = corpus_bleu(ref_tok, hyp_tok,
                         smoothing_function=SmoothingFunction().method0)
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_evaluate_all_full_surface():
    """The call signature src/main.py:378-383 makes (TypeError in the
    reference) must work and report all four metric families."""

    def embed(texts):
        rng = np.random.default_rng(0)
        return [rng.standard_normal((max(len(t.split()), 1), 8)) for t in texts]

    ev = Evaluator(embed_fn=embed)
    metrics = ev.evaluate_all(
        hypotheses=["hello there world", "how are you"],
        references=["hello world", "how are you doing"],
        true_label_ids=[1, 4],
        losses=[2.0, 2.2],
        pred_label_ids=[1, 3],
        loss_token_counts=[10.0, 30.0],
    )
    assert set(metrics) >= {"dist_1", "dist_2", "bs_precision", "bs_recall",
                            "bs_f1", "ppl", "emotion_acc",
                            "ppl_token_weighted"}
    assert metrics["ppl"] == pytest.approx(math.exp(2.1))
    # token-weighted: (2.0*10 + 2.2*30) / 40 = 2.15
    assert metrics["ppl_token_weighted"] == pytest.approx(math.exp(2.15))
    assert metrics["emotion_acc"] == pytest.approx(50.0)


def test_evaluate_all_without_bert_model_warns_not_crashes():
    ev = Evaluator()
    with pytest.warns(UserWarning):
        metrics = ev.evaluate_all(["a"], ["a"], losses=[1.0])
    assert "bs_f1" not in metrics
    assert "ppl" in metrics
