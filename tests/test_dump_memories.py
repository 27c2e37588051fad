"""Memory-dump parity: cli/dump_memories.py must collect the same
per-recipe payload the reference's predict=True forward returns
(reference src/dump_memories.py:33-75 + model.py:1120-1127 — entity/
action probs, [ingredient, per-step] entity vectors, and the
re-simulator's outputs in full mode), and the CLI must write the
reference-named pkl from a reference .chkpt."""

import json
import os
import pickle
import sys
import tempfile

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")

N_VIDEOS = 2


@pytest.fixture(scope="module")
def full_setup():
    names, feat_dir, dur_file = rb.setup_features(N_VIDEOS)
    ref_model, ref_ds, _ = rb.build_reference("full", feat_dir, dur_file)
    cfg, ours_ds = rb.build_ours("full", feat_dir, dur_file)
    rb.patch_deterministic_gumbel()
    return ref_model, ref_ds, cfg, ours_ds, feat_dir, dur_file


def test_memory_payload_parity(full_setup):
    import torch

    ref_model, ref_ds, cfg, ours_ds, _, _ = full_setup
    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)

    with torch.no_grad():
        memory_dict_list, ent_list, ac_list = ref_model(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            inputs["input_labels_list"], inputs["ingr_input_ids"],
            inputs["ingr_masks"], inputs["ingr_sep_masks"],
            inputs["batch_step_num"], inputs["ingr_id_dict"],
            inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
            predict=True)

    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)

    from svpc_tpu.cli.dump_memories import dump_memories
    # the shared feature dir may carry more videos than this test asked
    # for (setup_features caches across modules): bound to the first
    # batch, which is exactly ours_ds[0:N_VIDEOS] in dataset order
    dump = dump_memories(model, params, ours_ds,
                         cfg.replace_train(val_batch_size=N_VIDEOS),
                         max_batches=1)
    assert set(dump) == {m["name"] for m in metas}

    for b, meta in enumerate(metas):
        ref_mem = memory_dict_list[b]
        got = dump[meta["name"]]
        # reference full-mode payload keys, exactly (model.py:1120-1127)
        assert set(got) == {"entity_probs", "action_probs",
                            "entity_vectors", "re_pred_entity_probs",
                            "re_pred_action_probs", "re_entity_vectors"}

        def close(ours, ref_t, what):
            ref = ref_t.detach().numpy()
            assert ours.shape == ref.shape, (what, ours.shape, ref.shape)
            np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-5,
                                       err_msg=f"{what} ex {b}")

        close(got["entity_probs"], ref_mem["entity_probs"], "entity_probs")
        close(got["action_probs"], ref_mem["action_probs"], "action_probs")
        close(got["entity_vectors"][0], ref_mem["entity_vectors"][0],
              "ingredient vectors")
        close(got["entity_vectors"][1], ref_mem["entity_vectors"][1],
              "step entity vectors")
        close(got["re_pred_entity_probs"], ref_mem["re_pred_entity_probs"],
              "re entity probs")
        close(got["re_pred_action_probs"], ref_mem["re_pred_action_probs"],
              "re action probs")
        close(got["re_entity_vectors"], ref_mem["re_entity_vectors"],
              "re entity vectors")


def test_cli_writes_reference_named_pkl(full_setup, monkeypatch):
    """Drive the CLI end-to-end from a reference .chkpt: the output file
    is {model_type}_step_embedding_dict.pkl keyed by recipe id
    (reference dump_memories.py:339-341)."""
    import torch

    ref_model, ref_ds, cfg, ours_ds, feat_dir, dur_file = full_setup
    import svpc_tpu.cli.dump_memories as dm

    with tempfile.TemporaryDirectory() as d:
        chkpt = os.path.join(d, "model.chkpt")
        torch.save({"model": ref_model.state_dict(),
                    "model_cfg": ref_model.config,
                    "opt": None, "epoch": 0}, chkpt)
        monkeypatch.setattr(sys, "argv", [
            "dump_memories", "--model_type", "vivt",
            "--data_dir", cfg.data.data_dir,
            "--video_feature_dir", feat_dir,
            "--duration_file", dur_file,
            "--word2idx_path", cfg.data.word2idx_path,
            "--verb2idx_path", cfg.data.verb2idx_path,
            "--checkpoint", chkpt, "--torch_checkpoint",
            "--split", "val", "--val_batch_size", str(N_VIDEOS),
            "--output_dir", d,
            "--max_v_len", str(cfg.model.max_v_len),
            "--max_t_len", str(cfg.model.max_t_len),
            "--max_n_sen", str(cfg.model.max_n_sen),
            "--max_i_len", str(cfg.model.max_i_len)])
        dm.main()
        out = os.path.join(d, "vivt_step_embedding_dict.pkl")
        assert os.path.exists(out)
        with open(out, "rb") as f:
            dump = pickle.load(f)
    names = {m["name"] for m in (ours_ds[i].meta for i in range(N_VIDEOS))}
    # the CLI dumps every video with features in the shared dir; ours
    # must all be present
    assert names <= set(dump)
    entry = next(iter(dump.values()))
    assert entry["entity_probs"].ndim == 2
    assert [v.ndim for v in entry["entity_vectors"]] == [2, 3]
