"""cli.validate_data: the up-front damage report the reference lacks
(it silently drops missing-feature videos — fix_missing,
recursive_caption_dataset.py:95-110 — and crashes deep in the pipeline
on everything else)."""

import json
import logging
import os
import shutil

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")

REF = rb.REFERENCE_ROOT


def _argv(feat_dir, dur_file, extra):
    return ["--video_feature_dir", feat_dir, "--duration_file", dur_file,
            "--data_dir", os.path.join(REF, "densevid_eval/yc2_data"),
            "--word2idx_path", os.path.join(REF, "cache/yc2_word2idx.json"),
            "--verb2idx_path",
            os.path.join(REF, "cache/bosselut_verb_vocab.json"),
            "--video_feature_size", "24"] + extra


def _spec(ds):
    return {e["name"]: {"timestamps": e["timestamps"],
                        "ingredients": e["ingredients"]}
            for e in ds.data}


def test_clean_spec_passes(tmp_path):
    from svpc_tpu.cli.validate_data import main

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("copy", feat_dir, dur_file)
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(_spec(ds)))
    # consistent synthetic fixture: no errors, no SystemExit
    main(_argv(feat_dir, dur_file,
               ["--input_json", str(spec_path), "--strict"]))


def test_broken_data_reported(tmp_path, caplog):
    from svpc_tpu.cli.validate_data import main

    caplog.set_level(logging.INFO)

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("copy", feat_dir, dur_file)
    broken = tmp_path / "features"
    shutil.copytree(feat_dir, broken)
    v0, v1, v2 = [e["name"] for e in ds.data[:3]]
    os.remove(broken / f"{v0}_bn.npy")                 # missing file
    np.save(broken / f"{v1}_bn.npy",
            np.zeros((3, 8), np.float32))              # row mismatch
    spec = _spec(ds)
    spec[v2]["timestamps"][0] = [9.0, 2.0]             # inverted span
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))

    with pytest.raises(SystemExit):
        main(_argv(str(broken), dur_file,
                   ["--input_json", str(spec_path)]))
    text = caplog.text
    assert "missing feature file" in text
    assert "resnet rows" in text
    assert "bad timestamp" in text


def test_split_mode_reports_missing_features(caplog):
    """Split mode walks the full annotation file: fixture features exist
    for only 3 val videos, so the rest must be reported (the reference
    would drop them silently)."""
    from svpc_tpu.cli.validate_data import main

    caplog.set_level(logging.INFO)
    names, feat_dir, dur_file = rb.setup_features(3)
    with pytest.raises(SystemExit):
        main(_argv(feat_dir, dur_file, ["--split", "val"]))
    assert "missing feature file" in caplog.text
    assert "with errors" in caplog.records[-1].getMessage()


def test_malformed_spec_rejected(tmp_path, caplog):
    from svpc_tpu.cli.validate_data import main

    caplog.set_level(logging.INFO)
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("copy", feat_dir, dur_file)
    spec_path = tmp_path / "spec.json"

    # top-level shape wrong -> hard error
    spec_path.write_text(json.dumps([1, 2]))
    with pytest.raises(SystemExit, match="malformed spec"):
        main(_argv(feat_dir, dur_file, ["--input_json", str(spec_path)]))

    # one malformed LINE is reported per-video; good lines (incl. ones
    # without the optional ingredients key) still validate
    good = ds.data[0]
    spec_path.write_text(json.dumps({
        "vbad": [1, 2],
        good["name"]: {"timestamps": good["timestamps"]}}))
    with pytest.raises(SystemExit):  # exit 1: vbad has errors
        main(_argv(feat_dir, dur_file, ["--input_json", str(spec_path)]))
    assert "malformed spec line" in caplog.text
    assert "2 video(s): 1 with errors" in caplog.records[-1].getMessage()
