"""Golden parity tests against the PyTorch reference, run in-process.

These are the framework's ground-truth tests: data pipeline arrays,
forward losses/scores, and token-for-token greedy decoding must match the
reference (within float tolerance; greedy exactly).
"""

import os

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")

MODES = ["video", "copy", "reason_copy", "full"]
N_VIDEOS = 3


@pytest.fixture(scope="module")
def features():
    return rb.setup_features(N_VIDEOS)


@pytest.fixture(scope="module", params=MODES)
def mode_setup(request, features):
    mode = request.param
    names, feat_dir, dur_file = features
    ref_model, ref_ds, ref_cfg = rb.build_reference(mode, feat_dir, dur_file)
    cfg, ours_ds = rb.build_ours(mode, feat_dir, dur_file)
    rb.patch_deterministic_gumbel()
    return mode, ref_model, ref_ds, cfg, ours_ds


def test_data_parity(features):
    """Our fixed-shape arrays must agree with the reference dataset."""
    names, feat_dir, dur_file = features
    _, ref_ds, _ = rb.build_reference("full", feat_dir, dur_file)
    cfg, ours_ds = rb.build_ours("full", feat_dir, dur_file)
    assert len(ref_ds) == len(ours_ds) == N_VIDEOS

    for i in range(len(ref_ds)):
        items, meta, ingr, align, actions = ref_ds[i]
        ex = ours_ds[i]
        n = len(items)
        assert ex.meta["n_steps"] == n
        for s in range(n):
            np.testing.assert_array_equal(
                ex.arrays["input_ids"][s], items[s]["input_ids"])
            np.testing.assert_array_equal(
                ex.arrays["input_labels"][s], items[s]["input_labels"])
            np.testing.assert_array_equal(
                ex.arrays["input_mask"][s], items[s]["input_mask"])
            np.testing.assert_array_equal(
                ex.arrays["token_type_ids"][s], items[s]["token_type_ids"])
            # our layout keeps only the Lv video rows; the reference pads
            # features to L rows with zeros the model never reads
            lv = ex.arrays["video_feature"].shape[1]
            np.testing.assert_allclose(
                ex.arrays["video_feature"][s],
                items[s]["video_feature"][:lv], rtol=1e-6)
            assert np.abs(items[s]["video_feature"][lv:]).max() == 0.0
        # ingredients
        np.testing.assert_array_equal(ex.arrays["ingr_ids"], ingr["ingr_ids"])
        np.testing.assert_array_equal(ex.arrays["ingr_mask"], ingr["ingr_mask"])
        np.testing.assert_array_equal(
            ex.arrays["ingr_sep_mask"], ingr["ingr_sep_mask"])
        assert ex.meta["oov_word_dict"] == ingr["oov_word_dict"]
        # copy groups -> dense weights
        for e_idx, ids in ingr["ingr_id_dict"].items():
            got_ids = ex.arrays["copy_ids"][e_idx]
            got_w = ex.arrays["copy_weights"][e_idx]
            assert got_ids[:len(ids)].tolist() == ids
            np.testing.assert_allclose(got_w[:len(ids)], 1.0 / len(ids),
                                       rtol=1e-6)
        # supervision
        a = align.numpy()
        np.testing.assert_array_equal(
            ex.arrays["alignment"][:a.shape[0], :a.shape[1]], a)
        ac = actions.numpy()
        np.testing.assert_array_equal(ex.arrays["action"][:ac.shape[0]], ac)


def test_forward_parity(mode_setup):
    """Losses and prediction scores match the reference forward."""
    import torch

    mode, ref_model, ref_ds, cfg, ours_ds = mode_setup
    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)

    with torch.no_grad():
        total, pred_list, ent_list, ac_list = ref_model(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            inputs["input_labels_list"], inputs["ingr_input_ids"],
            inputs["ingr_masks"], inputs["ingr_sep_masks"],
            inputs["batch_step_num"], inputs["ingr_id_dict"],
            inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
            predict=False)

    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)
    out = model.apply(params, jbatch, deterministic=True,
                      rngs={"gumbel": __import__("jax").random.PRNGKey(0)})

    np.testing.assert_allclose(
        float(out.total_loss), float(total), rtol=2e-4,
        err_msg=f"total loss mismatch in mode {mode}")

    # per-step prediction scores for real steps
    for b, pred in enumerate(pred_list):
        ref_scores = pred.numpy()          # (S_b, T, C_b)
        s_b, t, c_b = ref_scores.shape
        got = np.asarray(out.prediction_scores)[b, :s_b, :, :c_b]
        np.testing.assert_allclose(got, ref_scores, rtol=5e-3, atol=2e-5,
                                   err_msg=f"scores mismatch mode {mode} ex {b}")

    if mode in ("full", "reason_copy"):
        for b, probs in enumerate(ent_list):
            ref_p = probs.numpy()
            got = np.asarray(out.ent_probs)[b, :ref_p.shape[0], :ref_p.shape[1]]
            np.testing.assert_allclose(got, ref_p, rtol=1e-3, atol=1e-5)
        for b, probs in enumerate(ac_list):
            ref_p = probs.numpy()
            got = np.asarray(out.ac_probs)[b, :ref_p.shape[0]]
            np.testing.assert_allclose(got, ref_p, rtol=1e-3, atol=1e-5)


def test_greedy_parity(mode_setup):
    """Token-for-token greedy decode parity."""
    import torch
    from types import SimpleNamespace

    mode, ref_model, ref_ds, cfg, ours_ds = mode_setup
    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)

    from src.translator import Translator
    checkpoint = {"model_cfg": ref_model.config,
                  "model": ref_model.state_dict()}
    translator = Translator(SimpleNamespace(cuda=False), checkpoint,
                            model=ref_model)
    with torch.no_grad():
        dec_seq_list, _ = translator.translate_batch_greedy(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            [e["ingr_ids"] for e in ingr], [e["ingr_mask"] for e in ingr],
            [torch.LongTensor(e["ingr_sep_mask"]) for e in ingr],
            [e["ingr_id_dict"] for e in ingr],
            [e["oov_word_dict"] for e in ingr],
            inputs["alignments"], inputs["actions"],
            inputs["batch_step_num"], ref_model)

    # NOTE: the reference mutates input_ids in-place (prepare_video_only_
    # inputs), so our batch must be built fresh from the dataset
    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)

    from svpc_tpu.decode.greedy import greedy_decode
    got = np.asarray(greedy_decode(model, params, jbatch))  # (B, S, T)

    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()       # (S_b, T)
        s_b = ref_tokens.shape[0]
        mismatch = (got[b, :s_b] != ref_tokens)
        assert not mismatch.any(), (
            f"mode {mode} ex {b}: {mismatch.sum()} token mismatches\n"
            f"ref:\n{ref_tokens}\ngot:\n{got[b, :s_b]}")
