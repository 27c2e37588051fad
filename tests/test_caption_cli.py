"""GT-free inference path (cli/caption.py): a dataset built from a user
spec (timestamps + ingredients only) must decode the same captions as the
annotated val dataset — greedy decode never reads the GT text
(reference translator.py:205-228 zeroes it)."""

import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_inference_entries_decode_matches_annotated():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import (CaptionDataset, batch_examples,
                                        inference_entries)
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.loop import run_greedy_eval

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("reason_copy", feat_dir, dur_file)
    cfg = cfg.replace_train(val_batch_size=2)

    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_examples([ds[0]]).items()}
    rngs = {"params": jax.random.PRNGKey(11),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    # user spec: timestamps + ingredients only, no sentences
    spec = {e["name"]: {"timestamps": e["timestamps"],
                        "ingredients": e["ingredients"]}
            for e in ds.data}
    entries = inference_entries(spec, cfg.model.max_n_sen)
    infer_ds = CaptionDataset(cfg, "infer", entries=entries)
    assert not infer_ds.missing
    assert len(infer_ds) == len(ds)

    sub_gt = run_greedy_eval(model, params, ds, cfg)
    sub_infer = run_greedy_eval(model, params, infer_ds, cfg)
    for vid, clips in sub_gt["results"].items():
        got = sub_infer["results"][vid]
        assert [c["sentence"] for c in got] == \
            [c["sentence"] for c in clips]
        assert [c["timestamp"] for c in got] == \
            [c["timestamp"] for c in clips]


def test_inference_entries_validation():
    from svpc_tpu.data.pipeline import inference_entries

    entries = inference_entries(
        {"v1": {"timestamps": [[0.0, 2.0], [2.0, 4.0]],
                "ingredients": ["salt"]}}, max_n_sen=12)
    assert entries[0]["sentences"] == ["", ""]

    # fewer sentences than timestamps must pad, not drop clips
    entries = inference_entries(
        {"v1": {"timestamps": [[0.0, 2.0], [2.0, 4.0], [4.0, 6.0]],
                "sentences": ["a"], "ingredients": ["salt"]}}, max_n_sen=12)
    assert entries[0]["sentences"] == ["a", "", ""]
    assert len(entries[0]["timestamps"]) == 3

    with pytest.raises(ValueError, match="at least one timestamp"):
        inference_entries({"v2": {"timestamps": [], "ingredients": []}},
                          max_n_sen=12)


def test_undersized_v_len_raises():
    """An explicit span bucket smaller than the batch's longest clip must
    error, not truncate (eager) or overrun the packed buffer (native)."""
    from svpc_tpu.data.packing import pack_examples

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("copy", feat_dir, dur_file)
    with pytest.raises(ValueError, match="v_len"):
        pack_examples([ds[0]], cfg.model.max_t_len, v_len=4)
