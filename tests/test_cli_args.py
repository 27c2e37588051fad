"""CLI argument surface: the architecture knobs of the reference's
argparse block (train.py:471-528) must reach the config, and the caption
CLI must run end-to-end from argv."""

import argparse
import json
import os

import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")

W2I = os.path.join(rb.REFERENCE_ROOT, "cache/yc2_word2idx.json")
V2I = os.path.join(rb.REFERENCE_ROOT, "cache/bosselut_verb_vocab.json")


def _tiny_argv(feat_dir, dur_file):
    argv = ["--model_type", "viv",
            "--data_dir", os.path.join(rb.REFERENCE_ROOT,
                                       "densevid_eval/yc2_data"),
            "--video_feature_dir", feat_dir,
            "--duration_file", dur_file,
            "--word2idx_path", W2I, "--verb2idx_path", V2I]
    for k, v in {**rb.GEOM, **rb.DIMS}.items():
        argv += [f"--{k}", str(v)]
    return argv


def test_arch_flags_reach_config():
    from svpc_tpu.cli.common import add_common_args, config_from_args

    names, feat_dir, dur_file = rb.setup_features(3)
    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(_tiny_argv(feat_dir, dur_file) + [
        "--hidden_dropout_prob", "0.2", "--use_asl", "bce",
        "--grad_clip", "-1", "--share_wd_cls_weight",
        "--word_vec_size", "64"])
    cfg = config_from_args(args)
    assert cfg.model.hidden_size == rb.DIMS["hidden_size"]
    assert cfg.model.num_attention_heads == rb.DIMS["num_attention_heads"]
    assert cfg.model.video_feature_size == rb.DIMS["video_feature_size"]
    assert cfg.model.max_v_len == rb.GEOM["max_v_len"]
    assert cfg.model.hidden_dropout_prob == 0.2
    assert cfg.model.use_asl is False
    assert cfg.model.share_wd_cls_weight is True
    assert cfg.train.grad_clip == -1
    assert cfg.model.model_mode == "reason_copy"
    # shared-weight constraint surfaces through validate()
    cfg.model.validate()  # word_vec_size == hidden_size == 64: ok
    with pytest.raises(ValueError, match="word_vec_size"):
        config_from_args(p.parse_args(
            _tiny_argv(feat_dir, dur_file)
            + ["--share_wd_cls_weight"])).model.validate()


def test_evaluate_rejects_inconsistent_beam_flags(monkeypatch, capsys):
    """Beam-flag combinations that cannot produce what they ask for must
    die at argument parsing, not as a tuple-unpack crash after the model
    loads: --use_beam with beam_size 1 (that IS greedy), and
    n_best > beam_size (a beam of K carries only K hypotheses)."""
    from svpc_tpu.cli import evaluate

    base = ["evaluate", "--video_feature_dir", "/nonexistent",
            "--duration_file", "/nonexistent.csv",
            "--checkpoint", "/nonexistent", "--output_dir", "/tmp/nope"]
    # control: a consistent flag set must get PAST parsing — it dies
    # later on the bogus data paths (FileNotFoundError from the vocab
    # load), NOT with an argparse usage error (SystemExit code 2)
    monkeypatch.setattr("sys.argv",
                        base + ["--use_beam", "--beam_size", "3",
                                "--n_best", "3"])
    with pytest.raises(FileNotFoundError):
        evaluate.main()
    # greedy with an explicit --beam_size 0 is fine: beam_size is
    # irrelevant without --use_beam, so no beam check may fire
    monkeypatch.setattr("sys.argv", base + ["--beam_size", "0"])
    with pytest.raises(FileNotFoundError):
        evaluate.main()
    for bad in (["--use_beam", "--beam_size", "1", "--n_best", "2"],
                ["--use_beam", "--beam_size", "1"],
                ["--use_beam", "--beam_size", "2", "--n_best", "3"],
                ["--n_best", "2"],
                # pp is a training-only capability: the shared arg
                # surface carries the flag but inference CLIs must fail
                # loudly instead of silently ignoring it (common.reject_pp)
                ["--pp_size", "2"]):
        monkeypatch.setattr("sys.argv", base + bad)
        with pytest.raises(SystemExit) as e:
            evaluate.main()
        assert e.value.code == 2, bad  # argparse usage error, pre-load
        capsys.readouterr()


def test_caption_cli_from_argv(tmp_path):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.cli.common import add_common_args, config_from_args
    from svpc_tpu.cli import caption
    from svpc_tpu.data.pipeline import (CaptionDataset, batch_examples,
                                        inference_entries)
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState, save_checkpoint

    names, feat_dir, dur_file = rb.setup_features(3)
    base = _tiny_argv(feat_dir, dur_file)

    p = argparse.ArgumentParser()
    add_common_args(p)
    cfg = config_from_args(p.parse_args(base))

    # checkpoint from a freshly initialized model
    anns = json.load(open(os.path.join(
        rb.REFERENCE_ROOT,
        "densevid_eval/yc2_data/bosselut_split_yc2_val_anet_format.json")))
    spec = {n: {"timestamps": anns[n]["timestamps"],
                "ingredients": anns[n]["ingredients"]} for n in names[:2]}
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))

    entries = inference_entries(spec, cfg.model.max_n_sen)
    ds = CaptionDataset(cfg, "infer", entries=entries)
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_examples([ds[0]]).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    state = TrainState.create(params, make_optimizer(cfg.train, 10),
                              use_ema=True)
    ckpt = save_checkpoint(str(tmp_path), state, cfg)

    out_path = tmp_path / "captions.json"
    caption.main(base + ["--checkpoint", ckpt,
                         "--input_json", str(spec_path),
                         "--output", str(out_path)])
    out = json.loads(out_path.read_text())
    assert set(out) == set(spec)
    for vid, clips in out.items():
        assert len(clips) == len(spec[vid]["timestamps"])
        for c in clips:
            assert set(c) == {"timestamp", "sentence"}
