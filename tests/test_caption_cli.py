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


def test_ingredient_budget_overflow_lenient_on_inference():
    """A user spec overflowing the ingredient budgets must truncate with a
    warning on the GT-free inference path (strict=False), while annotated
    splits keep the hard raise (round-1 VERDICT item 7)."""
    from svpc_tpu import tokenization as tok
    from svpc_tpu.data.pipeline import build_ingredient_arrays

    vocab = tok.Vocabulary.from_json(
        "/root/reference/cache/yc2_word2idx.json")
    # 40 single-word ingredients incl. many OOV made-up words
    ingredients = [f"zzzingredient{i}" for i in range(30)] + [
        "salt", "pepper", "oil", "butter", "sugar", "flour", "eggs",
        "milk", "cheese", "water"]
    kw = dict(max_i_len=120, max_entities=8, max_oov=4, max_ingr_words=4)

    with pytest.raises(ValueError):
        build_ingredient_arrays(ingredients, vocab, strict=True, **kw)

    arrays, meta = build_ingredient_arrays(
        ingredients, vocab, strict=False, **kw)
    assert len(meta["oov_word_dict"]) <= 4
    assert arrays["copy_ids"].shape == (8, 4)
    assert int(arrays["oov_count"]) <= 4
    # every extended id stays inside the padded extended vocab
    assert arrays["copy_ids"].max() < len(vocab) + 4
    # long multi-word ingredient group truncates, weights renormalized
    arrays2, _ = build_ingredient_arrays(
        ["one two three four five six seven"], vocab, strict=False, **kw)
    row = arrays2["copy_weights"][0]
    assert row.sum() == pytest.approx(1.0)


def test_native_pack_overflow_guard():
    """The native packer must error (not write past a clip slot) when the
    buffer's row budget is smaller than a clip's span — the stale-cache
    scenario from the round-1 advisor findings."""
    import numpy as np
    from svpc_tpu.native import get_lib, pack_video_into

    if get_lib() is None:
        pytest.skip("native library unavailable")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        r = os.path.join(d, "v_resnet.npy")
        b = os.path.join(d, "v_bn.npy")
        np.save(r, np.random.rand(40, 8).astype(np.float16))
        np.save(b, np.random.rand(40, 4).astype(np.float16))
        # clip spanning ~30 rows but a buffer with only 8 rows per clip
        out = np.zeros((1, 8, 12), np.float32)
        with pytest.raises(ValueError, match="clip span exceeds"):
            pack_video_into(r, b, np.array([[0.0, 29.0]]), 1.0,
                            max_v_len=40, out=out, lo=0)
        assert out.sum() == 0.0  # nothing was written


def test_feature_store_invalidate():
    """invalidate() drops cached row counts so a replaced file is re-read."""
    import numpy as np
    from svpc_tpu.data.features import FeatureStore

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        np.save(os.path.join(d, "v_resnet.npy"),
                np.zeros((10, 4), np.float32))
        np.save(os.path.join(d, "v_bn.npy"), np.zeros((10, 2), np.float32))
        store = FeatureStore(d)
        assert store.rows("v") == 10
        np.save(os.path.join(d, "v_resnet.npy"),
                np.zeros((25, 4), np.float32))
        assert store.rows("v") == 10  # cached
        store.invalidate()
        assert store.rows("v") == 25
