"""End-to-end reference-checkpoint interop: a torch-saved .chkpt file
imports into svpc_tpu and decodes token-for-token like the reference."""

import os
import tempfile

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_torch_chkpt_roundtrip_decode():
    import torch
    from types import SimpleNamespace

    names, feat_dir, dur_file = rb.setup_features(2)
    ref_model, ref_ds, ref_cfg = rb.build_reference("reason_copy",
                                                    feat_dir, dur_file)
    cfg, ours_ds = rb.build_ours("reason_copy", feat_dir, dur_file)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.chkpt")
        torch.save({"model": ref_model.state_dict(),
                    "model_cfg": ref_model.config,
                    "opt": None, "epoch": 0}, path)

        from svpc_tpu.model.load_reference import import_reference_checkpoint
        loaded_cfg, model, params = import_reference_checkpoint(path, cfg)

    assert loaded_cfg.model.model_mode == "reason_copy"
    assert loaded_cfg.model.hidden_size == ref_cfg["hidden_size"]

    # decode through the imported params and compare with the reference
    inputs, metas, ingr = rb.reference_batch(ref_ds, [0, 1])
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

    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.decode.greedy import greedy_decode
    batch = {k: jnp.asarray(v)
             for k, v in batch_examples([ours_ds[0], ours_ds[1]]).items()}
    got = np.asarray(greedy_decode(model, params, batch))
    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()
        assert (got[b, :ref_tokens.shape[0]] == ref_tokens).all()


def test_export_chkpt_runs_under_reference():
    """The reverse direction: a checkpoint trained in this framework
    exports to a reference-format .chkpt that the reference's strict
    load_state_dict accepts (test.py:382-383) and decodes token-for-token
    identically."""
    import jax
    import torch
    from types import SimpleNamespace

    names, feat_dir, dur_file = rb.setup_features(2)
    ref_model, ref_ds, ref_cfg = rb.build_reference("full", feat_dir,
                                                    dur_file)
    cfg, ours_ds = rb.build_ours("full", feat_dir, dur_file)

    # random params from OUR initializer — the tensors the reference gets
    # are genuinely ours
    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in batch_examples([ours_ds[0], ours_ds[1]]).items()}
    rngs = {"params": jax.random.PRNGKey(42),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    import os
    import tempfile
    from svpc_tpu.model.import_torch import export_reference_checkpoint
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ours.chkpt")
        export_reference_checkpoint(path, params, cfg, epoch=3)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    assert ckpt["epoch"] == 3
    assert ckpt["model_cfg"]["model_mode"] == "full"
    ref_model.load_state_dict(ckpt["model"])  # strict=True by default

    inputs, metas, ingr = rb.reference_batch(ref_ds, [0, 1])
    from src.translator import Translator
    translator = Translator(SimpleNamespace(cuda=False),
                            {"model_cfg": ref_model.config,
                             "model": ckpt["model"]}, model=ref_model)
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

    from svpc_tpu.decode.greedy import greedy_decode
    got = np.asarray(greedy_decode(model, params, batch))
    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()
        assert (got[b, :ref_tokens.shape[0]] == ref_tokens).all()
