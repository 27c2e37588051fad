"""End-to-end train-loop smoke on CPU: tiny model, real YC2 annotations,
synthetic features; exercises training, EMA eval, greedy decode, language
metrics, checkpointing and resume."""

import json
import os

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_train_loop_end_to_end(tmp_path):
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("full", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=2, val_batch_size=2, n_epoch=2,
                            max_es_cnt=10)
    # train on the val split's features (train-split features don't exist
    # in the fixture set) by pointing the loop at a val-features layout
    from svpc_tpu.train import loop as loop_mod
    from svpc_tpu.data.pipeline import CaptionDataset

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        result = loop_mod.train(cfg, str(tmp_path), max_steps_per_epoch=2,
                                eval_language=True, tensorboard=False)
    finally:
        CaptionDataset.__init__ = orig_init

    assert os.path.exists(tmp_path / "checkpoint_last")
    assert os.path.exists(tmp_path / "train.log.csv")
    hist = json.load(open(tmp_path / "history.json"))
    assert len(hist) == 2
    for h in hist:
        assert np.isfinite(h["train"]["loss_per_word"])
        assert "Bleu_4" in h["lang"]
    subs = json.load(open(tmp_path / "greedy_pred_val_epoch1.json"))
    assert len(subs["results"]) >= 1


def test_run_greedy_eval_packed_matches_dense():
    """The eval pipeline's packed decode (fixed clip budget) must emit the
    same submission JSON as the dense layout."""
    import jax
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("reason_copy", feat_dir, dur_file)
    cfg = cfg.replace_train(val_batch_size=2)

    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    import jax.numpy as jnp
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_examples([ds[0]]).items()}
    rngs = {"params": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    from svpc_tpu.train.loop import run_greedy_eval
    sub_packed = run_greedy_eval(model, params, ds, cfg)
    sub_dense = run_greedy_eval(model, params, ds,
                                cfg.replace_train(pack_clips=False))
    assert sub_packed == sub_dense
    assert len(sub_packed["results"]) == len(ds)


def test_save_mode_all_metric_tagged_checkpoints(tmp_path):
    """save_mode=all mirrors the reference (train.py:423-427): one
    checkpoint per epoch with the language metrics embedded in the name,
    and NO early stopping (the es counter lives in the 'best' branch)."""
    import glob
    import re

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=2, val_batch_size=2, n_epoch=2,
                            max_es_cnt=0, save_mode="all")
    from svpc_tpu.train import loop as loop_mod
    from svpc_tpu.data.pipeline import CaptionDataset

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        result = loop_mod.train(cfg, str(tmp_path), max_steps_per_epoch=2,
                                eval_language=True, tensorboard=False)
    finally:
        CaptionDataset.__init__ = orig_init

    # each checkpoint dir also gets a .cfg.json sidecar — keep the dirs
    tagged = sorted(p for p in glob.glob(str(tmp_path / "checkpoint_e*"))
                    if os.path.isdir(p))
    assert len(tagged) == 2, tagged
    pat = re.compile(r"checkpoint_e(\d+)_b[\d.-]+_m[\d.-]+_c[\d.-]+_r[\d.-]+$")
    assert all(pat.search(p) for p in tagged), tagged
    # max_es_cnt=0 would stop after one non-improving epoch under "best";
    # under "all" both epochs must run
    assert len(result["history"]) == 2
    assert not os.path.exists(tmp_path / "checkpoint_best")


def test_resume_same_workdir_preserves_logs_and_best(tmp_path):
    """Resume fixes: CSV rows stay unique per epoch, history is
    continuous, and the early-stop counter / best score survive."""
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=2, val_batch_size=2, n_epoch=2,
                            max_es_cnt=10)
    from svpc_tpu.train import loop as loop_mod
    from svpc_tpu.data.pipeline import CaptionDataset

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        loop_mod.train(cfg, str(tmp_path), max_steps_per_epoch=2,
                       eval_language=False, tensorboard=False)
        cfg2 = cfg.replace_train(n_epoch=4)
        result = loop_mod.train(
            cfg2, str(tmp_path), max_steps_per_epoch=2,
            eval_language=False, tensorboard=False,
            resume_from=str(tmp_path / "checkpoint_last"))
    finally:
        CaptionDataset.__init__ = orig_init

    rows = open(tmp_path / "valid.log.csv").read().strip().splitlines()
    epochs = [int(r.split(",")[0]) for r in rows[1:]]
    assert epochs == [0, 1, 2, 3], epochs  # appended, no duplicates
    hist = json.load(open(tmp_path / "history.json"))
    assert [h["epoch"] for h in hist] == [0, 1, 2, 3]
    assert len(result["history"]) == 4


def test_run_greedy_eval_mesh_matches_single_device():
    """Multi-chip serving (cli.evaluate --dp_size/--tp_size): the mesh-
    sharded greedy eval must emit the identical submission JSON."""
    import jax
    import jax.numpy as jnp
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("reason_copy", feat_dir, dur_file)
    cfg = cfg.replace_train(val_batch_size=2)

    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, shard_params
    from svpc_tpu.train.loop import run_greedy_eval

    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_examples([ds[0]]).items()}
    rngs = {"params": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    sub_single = run_greedy_eval(model, params, ds, cfg)
    mesh = make_mesh(dp_size=2, tp_size=2)
    sharded = dict(params)
    sharded["params"] = shard_params(mesh, params["params"])
    sub_mesh = run_greedy_eval(model, sharded, ds, cfg, mesh=mesh)
    assert sub_single == sub_mesh


def test_midepoch_checkpoint_resume_exact(tmp_path):
    """--checkpoint_every_steps: a run killed mid-epoch resumes INSIDE
    the epoch and lands on the exact uninterrupted trajectory (params,
    optimizer state, val metrics) — deterministic shuffle + step-keyed
    rng folding make skipping the already-trained batches exact."""
    import jax

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("full", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=1, val_batch_size=2, n_epoch=2,
                            checkpoint_every_steps=1)

    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train import loop as loop_mod
    import svpc_tpu.runtime as rt

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    class Boom(Exception):
        pass

    orig_retry = rt.transient_retry
    calls = {"n": 0}

    def bombing_retry(fn, attempts=3, what="step"):
        wrapped = orig_retry(fn, attempts, what)
        if what != "train step":
            return wrapped

        def bomb(*a, **k):
            if calls["n"] >= 4:  # 3 steps of epoch 0 + 1 step of epoch 1
                raise Boom()
            calls["n"] += 1
            return wrapped(*a, **k)

        return bomb

    CaptionDataset.__init__ = patched_init
    try:
        res_a = loop_mod.train(cfg, str(tmp_path / "a"),
                               eval_language=False, tensorboard=False)

        rt.transient_retry = bombing_retry
        try:
            with pytest.raises(Boom):
                loop_mod.train(cfg, str(tmp_path / "b"),
                               eval_language=False, tensorboard=False)
        finally:
            rt.transient_retry = orig_retry

        prog = json.load(open(tmp_path / "b" /
                              "checkpoint_last.progress.json"))
        assert prog == {"epoch": 1, "batches_done": 1, "step": 4}

        res_b = loop_mod.train(
            cfg, str(tmp_path / "b"), eval_language=False,
            tensorboard=False,
            resume_from=str(tmp_path / "b" / "checkpoint_last"))
    finally:
        CaptionDataset.__init__ = orig_init

    # bit-exact trajectory: params AND optimizer state
    a_leaves = jax.tree.leaves(jax.device_get(
        (res_a["state"].params, res_a["state"].opt_state,
         res_a["state"].ema_shadow)))
    b_leaves = jax.tree.leaves(jax.device_get(
        (res_b["state"].params, res_b["state"].opt_state,
         res_b["state"].ema_shadow)))
    assert len(a_leaves) == len(b_leaves)
    for la, lb in zip(a_leaves, b_leaves):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    assert int(res_a["state"].step) == int(res_b["state"].step) == 6
    # the epoch-1 validation metrics match the uninterrupted run's
    va = res_a["history"][-1]["val"]
    vb = res_b["history"][-1]["val"]
    assert va["loss_per_word"] == pytest.approx(vb["loss_per_word"],
                                                rel=1e-6)
