"""anet-dataset-path coverage: the reference advertises
``--dset_name anet`` (train.py:467) with three live semantics — "v_"
prefix stripping for feature/duration lookups
(recursive_caption_dataset.py:98,186,292), an int-truncating duration
formula (:119-125), and the hardcoded ``_0CqozZun3U`` fix (:125).
No anet data ships with the reference, so this exercises the branch on
synthetic features (only the yc2 branch was ever driven before)."""

import json
import math
import os

import numpy as np

from svpc_tpu.config import Config, DataConfig, ModelConfig


def _write_anet_fixture(tmp_path, n_videos=2, seed=3):
    """yc2-named split file (the reference hardcodes those names even in
    anet mode, set_data_mode :80-92) whose video names carry the anet
    "v_" prefix, plus features/durations keyed by the STRIPPED name."""
    rng = np.random.RandomState(seed)
    data_dir = tmp_path / "data"
    feat_dir = tmp_path / "features"
    os.makedirs(data_dir)
    os.makedirs(feat_dir)
    anns, lines = {}, []
    for i in range(n_videos):
        name, stripped = f"v_vid{i:04d}", f"vid{i:04d}"
        duration = 60.0 + 10 * i
        n_frames = int(duration * 30)
        # anet duration math (int truncation where yc2 uses ceil)
        frm2sec = duration * int(
            n_frames * 1. / int(duration) * 0.5) * 1. / n_frames
        feat_len = max(int(math.ceil(duration / frm2sec)) + 2, 8)
        np.save(feat_dir / f"{stripped}_resnet.npy",
                rng.randn(feat_len, 2048).astype(np.float32))
        np.save(feat_dir / f"{stripped}_bn.npy",
                rng.randn(feat_len, 1024).astype(np.float32))
        lines.append(f"{stripped},{duration},{n_frames}\n")
        anns[name] = {
            "duration": duration,
            "timestamps": [[1.0, 10.0], [12.0, 30.0]],
            "sentences": ["mix the butter", "add the flour"],
            "ingredients": ["butter", "flour"],
        }
    with open(data_dir / "bosselut_split_yc2_val_anet_format.json", "w") as f:
        json.dump(anns, f)
    dur_file = tmp_path / "dur.csv"
    with open(dur_file, "w") as f:
        f.writelines(lines)
    return data_dir, feat_dir, dur_file, anns


def test_anet_dataset_path(tmp_path):
    from svpc_tpu.data.pipeline import CaptionDataset

    data_dir, feat_dir, dur_file, anns = _write_anet_fixture(tmp_path)
    w2i_path = "/root/reference/cache/yc2_word2idx.json"
    v2i_path = "/root/reference/cache/bosselut_verb_vocab.json"
    cfg = Config(
        model=ModelConfig(
            vocab_size=len(json.load(open(w2i_path))),
            action_vocab_size=len(json.load(open(v2i_path))),
            model_mode="full", max_v_len=100, max_t_len=22, max_n_sen=4,
            max_entities=8, max_oov=8, max_ingr_words=4),
        data=DataConfig(
            dset_name="anet", data_dir=str(data_dir),
            video_feature_dir=str(feat_dir), duration_file=str(dur_file),
            word2idx_path=w2i_path, verb2idx_path=v2i_path))

    ds = CaptionDataset(cfg, "val", num_steps=4)
    # nothing dropped: feature files found under the stripped name
    assert ds.missing == []
    assert len(ds) == 2

    # anet duration semantics: int truncation, not ceil — they differ
    # for these fixture durations
    frm2sec = ds.frame_to_second["vid0000"]
    duration, n_frames = 60.0, 1800
    expected_anet = duration * int(
        n_frames * 1. / int(duration) * 0.5) * 1. / n_frames
    yc2_formula = duration * math.ceil(
        n_frames * 1. / duration * 0.5) * 1. / n_frames
    np.testing.assert_allclose(frm2sec, expected_anet, rtol=0)
    assert frm2sec != yc2_formula or expected_anet == yc2_formula
    # the reference's hardcoded anet fix rides along
    assert ds.frame_to_second["_0CqozZun3U"] == 0.5

    # an example builds end-to-end from the prefixed name
    ex = ds.make_example(ds.data[0]).arrays
    assert ex["video_feature"].shape[-1] == 3072
    assert ex["step_mask"][:2].all()


def test_anet_missing_feature_filtered(tmp_path):
    """fix_missing must look up the STRIPPED name: a video whose feature
    files are absent is dropped by its prefixed name (reference
    recursive_caption_dataset.py:95-110)."""
    from svpc_tpu.data.pipeline import CaptionDataset

    data_dir, feat_dir, dur_file, anns = _write_anet_fixture(tmp_path)
    os.remove(feat_dir / "vid0001_resnet.npy")
    w2i_path = "/root/reference/cache/yc2_word2idx.json"
    v2i_path = "/root/reference/cache/bosselut_verb_vocab.json"
    cfg = Config(
        model=ModelConfig(
            vocab_size=len(json.load(open(w2i_path))),
            action_vocab_size=len(json.load(open(v2i_path))),
            model_mode="full", max_v_len=100, max_t_len=22, max_n_sen=4,
            max_entities=8, max_oov=8, max_ingr_words=4),
        data=DataConfig(
            dset_name="anet", data_dir=str(data_dir),
            video_feature_dir=str(feat_dir), duration_file=str(dur_file),
            word2idx_path=w2i_path, verb2idx_path=v2i_path))
    ds = CaptionDataset(cfg, "val", num_steps=4)
    assert ds.missing == ["v_vid0001"]
    assert [e["name"] for e in ds.data] == ["v_vid0000"]
