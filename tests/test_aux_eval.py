"""Tests for the auxiliary evaluation tools (diversity, dense tIoU eval,
merge utility, ingredient F1)."""

import json
import os
import tempfile

import numpy as np

from svpc_tpu.evaluation.dense_eval import (
    evaluate_dense_captions, merge_dicts_by_prefix, tiou)
from svpc_tpu.evaluation.diversity import diversity_stats
from svpc_tpu.evaluation.ingredient_f1 import (
    extract_step_ingredients, ingredient_f1)


def test_tiou():
    assert tiou([0, 10], [0, 10]) == 1.0
    assert tiou([0, 10], [5, 15]) == 5 / 15
    assert tiou([0, 5], [10, 15]) == 0.0


def test_dense_eval_perfect():
    preds = {"v1": [
        {"sentence": "add the salt to the hot pan", "timestamp": [0, 10]},
        {"sentence": "stir the pot with a big spoon", "timestamp": [12, 20]}]}
    refs = {"v1": {"timestamps": [[0, 10], [12, 20]],
                   "sentences": ["add the salt to the hot pan",
                                 "stir the pot with a big spoon"]}}
    out = evaluate_dense_captions(preds, refs)
    assert out["Recall"] == 1.0 and out["Precision"] == 1.0
    np.testing.assert_allclose(out["Bleu_4"], 1.0, atol=1e-6)


def test_dense_eval_coverage_counts_sentenceless_timestamps():
    """Localization recall/precision are by tIoU alone (reference
    evaluate.py:145-152); a GT timestamp with no paired sentence still
    counts as covered and a prediction matching only it is still
    precise — it just contributes no sentence-scoring pair."""
    preds = {"v1": [
        {"sentence": "add the salt to the hot pan", "timestamp": [0, 10]},
        {"sentence": "stir the pot with a big spoon", "timestamp": [12, 20]},
        {"sentence": "serve it hot on a clean plate", "timestamp": [30, 40]}]}
    refs = {"v1": {"timestamps": [[0, 10], [12, 20], [30, 40]],
                   "sentences": ["add the salt to the hot pan",
                                 "stir the pot with a big spoon"]}}
    out = evaluate_dense_captions(preds, refs)
    assert out["Recall"] == 1.0 and out["Precision"] == 1.0
    # the sentence metrics only see the two sentence-bearing pairs
    np.testing.assert_allclose(out["Bleu_4"], 1.0, atol=1e-6)


def test_scorers_agree_on_empty_eval():
    """All three pure-python scorers return 0.0 (not NaN/raise) on an
    empty eval, so callers can rely on one degradation contract."""
    from svpc_tpu.evaluation.bleu import compute_bleu
    from svpc_tpu.evaluation.cider import compute_cider_d
    from svpc_tpu.evaluation.rouge import compute_rouge_l
    assert compute_bleu({}, {}) == ([0.0] * 4, [[], [], [], []])
    assert compute_cider_d({}, {}) == (0.0, [])
    assert compute_rouge_l({}, {}) == (0.0, [])


def test_diversity():
    preds = {"v1": [{"sentence": "add the salt"},
                    {"sentence": "add the salt"},
                    {"sentence": "stir the pot"}]}
    stats = diversity_stats(preds, training_sentences=["add the salt"])
    np.testing.assert_allclose(stats["unique_sentence_ratio"], 2 / 3)
    np.testing.assert_allclose(stats["novel_sentence_ratio"], 1 / 3)
    assert 0 < stats["distinct_1"] <= 1


def test_merge_by_prefix():
    with tempfile.TemporaryDirectory() as d:
        p1 = os.path.join(d, "a.json")
        p2 = os.path.join(d, "b.json")
        json.dump({"x": 1}, open(p1, "w"))
        json.dump({"x": 2}, open(p2, "w"))
        merged = merge_dicts_by_prefix(
            [(p1, "train_"), (p2, "val_")], os.path.join(d, "out.json"))
    assert merged == {"train_x": 1, "val_x": 2}


def test_ingredient_extraction_matches_reference_semantics():
    """Mirror calculate_ingredient_f1.py:6-30: substring match against the
    recipe list, then per-word match against the cross-corpus dictionary."""
    sents = ["add the olive oil and garlic", "stir in butter"]
    ingredients = ["olive oil", "garlic"]
    all_dict = {"olive oil", "garlic", "butter"}
    steps = extract_step_ingredients(sents, ingredients, all_dict)
    assert steps[0] == ["olive oil", "garlic"]
    assert steps[1] == ["butter"]

    gt = {"r1": dict(ingredients=ingredients, sentences=sents)}
    gen = {"r1": dict(ingredients=ingredients,
                      sentences=["add garlic", "mix flour"])}
    out = ingredient_f1(gt, gen, all_dict)
    # gen step1: garlic (correct); gen step2: nothing matched
    assert out["recall"] == 1 / 3
    assert out["precision"] == 1.0


def test_build_vocab_reproduces_shipped_vocabulary():
    """Our builder regenerates the exact word set of the reference's
    published cache/yc2_word2idx.json (951 words, min_count=3 — ids can
    differ because the reference iterates a hash-ordered set)."""
    import pytest
    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        pytest.skip("reference repo not mounted")
    from svpc_tpu.tokenization import build_vocab
    train = json.load(open(os.path.join(
        ref_root, "densevid_eval/yc2_data/bosselut_yc2_train_anet_format.json")))
    sentences = [s for v in train.values() for s in v["sentences"]]
    ours = build_vocab(sentences, min_word_count=3)
    ref = json.load(open(os.path.join(ref_root, "cache/yc2_word2idx.json")))
    assert set(ours) == set(ref)
    assert len(ours) == 951
