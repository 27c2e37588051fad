"""k-steps-per-dispatch scanning (train/step.make_multi_train_step +
data/packing.stack_batches): one device call carries K optimizer steps.

The scan body IS make_train_step (same rng folding by state.step), so the
K-step trajectory must match K sequential single-step dispatches; packed
batches of different buckets are repadded to one group shape first, which
must not change any value (padding rows/columns are masked out of every
loss term).
"""

import dataclasses

import numpy as np
import pytest


def _setup(mode="full", batch_size=2, n_batches=3, packed=False,
           dp_shards=1):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState

    cfg = tiny_test_config(mode)
    cfg = cfg.replace_train(batch_size=batch_size)
    model = SVPCModel(cfg.model)
    batches = [synthetic_batch(cfg, batch_size=batch_size, seed=s)
               for s in range(n_batches)]
    if packed:
        from svpc_tpu.data.packing import pack_batch
        batches = [pack_batch(b, cfg.model.max_t_len, clip_multiple=2,
                              v_multiple=2, dp_shards=dp_shards)
                   for b in batches]
    jbatch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, jbatch, deterministic=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=10)
    state = TrainState.create(params, tx, use_ema=True)
    return cfg, model, tx, state, batches


def _assert_tree_close(a, b, rtol=1e-6, atol=1e-7):
    import jax
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


def test_multi_step_matches_sequential():
    """One scan dispatch over K stacked batches == K single dispatches:
    params, optimizer state, EMA and per-step metrics all match (dropout
    and gumbel noise included — both paths fold the rng by state.step)."""
    import jax
    from svpc_tpu.data.packing import stack_batches
    from svpc_tpu.train.step import make_multi_train_step, make_train_step

    cfg, model, tx, state0, batches = _setup("full", n_batches=3)
    rng = jax.random.PRNGKey(7)

    one = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    seq_metrics = []
    for b in batches:
        seq_state, m = one(seq_state, b, rng)
        seq_metrics.append(m)

    multi = jax.jit(make_multi_train_step(model, tx, cfg))
    stacked = stack_batches(batches, cfg.model.max_t_len)
    multi_state, mm = multi(state0, stacked, rng)

    assert int(multi_state.step) == int(seq_state.step) == 3
    _assert_tree_close(multi_state.params, seq_state.params)
    _assert_tree_close(multi_state.opt_state, seq_state.opt_state)
    _assert_tree_close(multi_state.ema_shadow, seq_state.ema_shadow)
    for i, m in enumerate(seq_metrics):
        np.testing.assert_allclose(float(mm["loss"][i]), float(m["loss"]),
                                   rtol=1e-6)
        assert int(mm["n_correct"][i]) == int(m["n_correct"])
        assert int(mm["n_word"][i]) == int(m["n_word"])


def test_repad_packed_value_identity():
    """Growing a packed batch's (n_clips, v_len) buckets is invisible to
    the model: identical loss and identical parameter gradients."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.packing import repad_packed

    cfg, model, _, state, batches = _setup("full", packed=True)
    b = batches[0]
    T = cfg.model.max_t_len
    N = b["clip_mask"].shape[0]
    v = b["clip_input_ids"].shape[-1] - T
    grown = repad_packed(b, T, N + 4, min(v + 2, cfg.model.max_v_len), 1)
    assert grown["clip_mask"].shape[0] == N + 4

    def loss(p, batch):
        return model.apply({"params": p},
                           {k: jnp.asarray(x) for k, x in batch.items()},
                           deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss

    p = state.params["params"]
    l0, g0 = jax.value_and_grad(loss)(p, b)
    l1, g1 = jax.value_and_grad(loss)(p, grown)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    _assert_tree_close(g0, g1, rtol=1e-5, atol=1e-6)

    # no-op fast path: same geometry returns the same object
    assert repad_packed(b, T, N, v, 1) is b


def test_stack_mixed_packed_buckets():
    """Batches packed into different (n_clips, v_len) buckets stack into
    one scan batch, and the scanned trajectory still matches sequential
    single-step dispatches on the original (smaller) batches."""
    import jax
    from svpc_tpu.data.packing import stack_batches
    from svpc_tpu.train.step import make_multi_train_step, make_train_step

    cfg, model, tx, state0, batches = _setup("reason_copy", packed=True,
                                             n_batches=2)
    # force different buckets: regrow the second batch only
    from svpc_tpu.data.packing import repad_packed
    T = cfg.model.max_t_len
    N = batches[1]["clip_mask"].shape[0]
    v = batches[1]["clip_input_ids"].shape[-1] - T
    batches[1] = repad_packed(batches[1], T, batches[0]["clip_mask"].shape[0]
                              + 4, min(v + 2, cfg.model.max_v_len), 1)
    assert (batches[0]["clip_mask"].shape
            != batches[1]["clip_mask"].shape)

    rng = jax.random.PRNGKey(7)
    one = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    for b in batches:
        seq_state, _ = one(seq_state, b, rng)

    stacked = stack_batches(batches, T)
    assert stacked["clip_mask"].shape[0] == 2
    multi = jax.jit(make_multi_train_step(model, tx, cfg))
    multi_state, _ = multi(state0, stacked, rng)
    _assert_tree_close(multi_state.params, seq_state.params,
                       rtol=1e-5, atol=1e-6)


def test_multi_step_under_dp_mesh():
    """Stacked batches shard over dp on axis 1 (stacked_batch_sharding);
    the dp=2 multi-step trajectory equals the single-device sequential
    one (sum-loss semantics)."""
    import jax
    from svpc_tpu.data.packing import stack_batches
    from svpc_tpu.parallel.mesh import (make_mesh, shard_params,
                                        stacked_batch_sharding)
    from svpc_tpu.train.step import make_multi_train_step, make_train_step

    assert len(jax.devices()) >= 2
    cfg, model, tx, state0, batches = _setup("copy", batch_size=4,
                                             n_batches=2, packed=True,
                                             dp_shards=2)
    rng = jax.random.PRNGKey(7)
    one = jax.jit(make_train_step(model, tx, cfg))
    seq_state = state0
    for b in batches:
        seq_state, _ = one(seq_state, b, rng)

    mesh = make_mesh(dp_size=2)
    state_m = shard_params(mesh, state0)  # whole state, loop.py-style
    stacked = stack_batches(batches, cfg.model.max_t_len, dp_shards=2)
    sh = stacked_batch_sharding(mesh)
    stacked = {k: jax.device_put(v, sh) for k, v in stacked.items()}
    multi = jax.jit(make_multi_train_step(model, tx, cfg))
    state_m, mm = multi(state_m, stacked, rng)
    _assert_tree_close(state_m.params, seq_state.params,
                       rtol=2e-5, atol=1e-6)


def test_aggregate_metrics_sums_stacked_arrays():
    from svpc_tpu.train.step import aggregate_metrics

    stacked = {"loss": np.array([2.0, 4.0]),
               "n_correct": np.array([1, 3]),
               "n_word": np.array([2, 4]),
               "nonfinite_skipped": np.array([0, 1], np.int32)}
    scalar = {"loss": 6.0, "n_correct": 4, "n_word": 6,
              "nonfinite_skipped": 0}
    a = aggregate_metrics([stacked])
    b = aggregate_metrics([scalar])
    assert a["loss_per_word"] == pytest.approx(b["loss_per_word"])
    assert a["acc"] == pytest.approx(b["acc"])
    assert a["nonfinite_skipped"] == 1


def test_group_stack_batches_meta_attribution():
    """Metas split at the same boundary as the batches: the epoch tail's
    partial-accum group carries ITS videos' metas, not the preceding full
    group's (round-4 ADVICE) — asserted per-group for a 7-batch epoch
    under k=2, accum=2 (one full group, one whole tail group, one
    partial)."""
    from svpc_tpu.train.loop import group_stack_batches

    batches = [({"x": np.full((2, 3), i, np.float32)}, [f"m{i}"])
               for i in range(7)]
    groups = list(group_stack_batches(iter(batches), k=2, max_t_len=4,
                                      accum=2))
    metas = [ms for _, ms in groups]
    assert metas == [["m0", "m1", "m2", "m3"],  # full (2, 2) group
                     ["m4", "m5"],              # whole tail accum group
                     ["m6"]]                    # partial (1, 1) flush
    shapes = [g["x"].shape for g, _ in groups]
    assert shapes == [(2, 2, 2, 3), (1, 2, 2, 3), (1, 1, 2, 3)]
    # every batch's values land in the group its metas claim
    np.testing.assert_array_equal(groups[1][0]["x"][0, 0],
                                  np.full((2, 3), 4, np.float32))
    np.testing.assert_array_equal(groups[2][0]["x"][0, 0],
                                  np.full((2, 3), 6, np.float32))


def test_steps_per_dispatch_validation():
    from svpc_tpu.config import TrainConfig

    with pytest.raises(ValueError):
        TrainConfig(steps_per_dispatch=0)
    # composes with accumulation since round 4 (make_accum_train_step)
    TrainConfig(steps_per_dispatch=2, grad_accum_steps=2)


def test_multi_accum_matches_unfused():
    """K=2 scanned optimizer steps of A=2 accumulated microbatches each
    (one dispatch, batches stacked (K, A, ...)) reproduce the loop's
    unfused grad_step/tree_add/apply_step path exactly: same rng folding
    (fold_in(fold_in(rng, step), micro)), same gradient sum, same
    params/moments/EMA."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.packing import stack_batches
    from svpc_tpu.train.step import (make_apply_step, make_grad_step,
                                     make_multi_train_step, tree_add)

    cfg, model, tx, state0, batches = _setup("full", n_batches=4)
    cfg = cfg.replace_train(grad_accum_steps=2, steps_per_dispatch=2)
    rng = jax.random.PRNGKey(7)

    # unfused ground truth: the exact sequence train/loop.py runs at
    # steps_per_dispatch == 1 (host opt_step mirror folding included)
    grad_step = jax.jit(make_grad_step(model, cfg))
    apply_step = jax.jit(make_apply_step(tx, cfg))
    seq_state, opt_step = state0, 0
    seq_losses = []
    for g_i, group in enumerate([batches[:2], batches[2:]]):
        acc = None
        for i, b in enumerate(group):
            micro_rng = jax.random.fold_in(
                jax.random.fold_in(rng, opt_step), i)
            g, m = grad_step(seq_state.params["params"], b, micro_rng)
            seq_losses.append(float(m["loss"]))
            acc = g if acc is None else jax.jit(tree_add)(acc, g)
        seq_state, _ = apply_step(seq_state, acc)
        opt_step += 1

    stacked = stack_batches(batches, cfg.model.max_t_len)
    stacked = {k: v.reshape((2, 2) + v.shape[1:])
               for k, v in stacked.items()}
    multi = jax.jit(make_multi_train_step(model, tx, cfg))
    multi_state, mm = multi(state0, stacked, rng)

    assert int(multi_state.step) == int(seq_state.step) == 2
    assert mm["loss"].shape == (2,)  # K optimizer steps, A-summed losses
    np.testing.assert_allclose(
        np.asarray(mm["loss"]),
        [seq_losses[0] + seq_losses[1], seq_losses[2] + seq_losses[3]],
        rtol=1e-6)
    _assert_tree_close(multi_state.params, seq_state.params)
    _assert_tree_close(multi_state.opt_state, seq_state.opt_state)
    _assert_tree_close(multi_state.ema_shadow, seq_state.ema_shadow)


def test_multi_accum_partial_tail_group():
    """A (1, r < accum) partial tail group equals the unfused epoch-end
    partial flush (r microbatches, one apply)."""
    import jax
    from svpc_tpu.data.packing import stack_batches
    from svpc_tpu.train.step import (make_apply_step, make_grad_step,
                                     make_multi_train_step)

    cfg, model, tx, state0, batches = _setup("copy", n_batches=1)
    cfg = cfg.replace_train(grad_accum_steps=2, steps_per_dispatch=2)
    rng = jax.random.PRNGKey(7)

    grad_step = jax.jit(make_grad_step(model, cfg))
    apply_step = jax.jit(make_apply_step(tx, cfg))
    micro_rng = jax.random.fold_in(jax.random.fold_in(rng, 0), 0)
    g, _ = grad_step(state0.params["params"], batches[0], micro_rng)
    seq_state, _ = apply_step(state0, g)

    stacked = {k: v[None] for k, v in
               stack_batches(batches, cfg.model.max_t_len).items()}
    multi = jax.jit(make_multi_train_step(model, tx, cfg))
    multi_state, _ = multi(state0, stacked, rng)
    assert int(multi_state.step) == 1
    _assert_tree_close(multi_state.params, seq_state.params)
    _assert_tree_close(multi_state.opt_state, seq_state.opt_state)


def test_train_loop_spd_composes_with_accum(tmp_path):
    """train() with --steps_per_dispatch 2 --grad_accum_steps 2 matches
    the unfused --grad_accum_steps 2 history (dropout ACTIVE — both paths
    fold the rng by (optimizer step, microbatch index), so even the noise
    matches; 3 host batches exercise the (1, r) partial tail group)."""
    import json

    from tests import reference_bridge as rb

    if not rb.reference_available():
        pytest.skip("reference repo not mounted")

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=1, val_batch_size=2, n_epoch=1,
                            max_es_cnt=10, grad_accum_steps=2)
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train import loop as loop_mod

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        loop_mod.train(cfg, str(tmp_path / "unfused"),
                       eval_language=False, tensorboard=False)
        loop_mod.train(cfg.replace_train(steps_per_dispatch=2),
                       str(tmp_path / "fused"),
                       eval_language=False, tensorboard=False)
    finally:
        CaptionDataset.__init__ = orig_init

    h1 = json.load(open(tmp_path / "unfused" / "history.json"))
    h2 = json.load(open(tmp_path / "fused" / "history.json"))
    assert len(h1) == len(h2) == 1
    np.testing.assert_allclose(h1[0]["train"]["loss_per_word"],
                               h2[0]["train"]["loss_per_word"], rtol=1e-5)
    np.testing.assert_allclose(h1[0]["val"]["loss_per_word"],
                               h2[0]["val"]["loss_per_word"], rtol=1e-5)


def test_train_loop_steps_per_dispatch(tmp_path):
    """The real train() loop with --steps_per_dispatch 2 produces the
    same history as single-step dispatches (epoch tail exercises the
    smaller final group)."""
    import json

    from tests import reference_bridge as rb

    if not rb.reference_available():
        pytest.skip("reference repo not mounted")

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    # dropout makes the two runs share rng folding exactly (by step), so
    # histories must match to float tolerance
    cfg = cfg.replace_train(batch_size=1, val_batch_size=2, n_epoch=1,
                            max_es_cnt=10)
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train import loop as loop_mod

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        loop_mod.train(cfg, str(tmp_path / "one"),
                       eval_language=False, tensorboard=False)
        loop_mod.train(cfg.replace_train(steps_per_dispatch=2),
                       str(tmp_path / "multi"),
                       eval_language=False, tensorboard=False)
    finally:
        CaptionDataset.__init__ = orig_init

    h1 = json.load(open(tmp_path / "one" / "history.json"))
    h2 = json.load(open(tmp_path / "multi" / "history.json"))
    assert len(h1) == len(h2) == 1
    np.testing.assert_allclose(h1[0]["train"]["loss_per_word"],
                               h2[0]["train"]["loss_per_word"], rtol=1e-5)
    np.testing.assert_allclose(h1[0]["val"]["loss_per_word"],
                               h2[0]["val"]["loss_per_word"], rtol=1e-5)


def test_train_loop_spd_respects_step_cap(tmp_path):
    """max_steps_per_epoch caps the host batches BEFORE grouping, so a
    K-step dispatch cannot overshoot: capped spd=2 history equals capped
    spd=1 history (3 videos, cap 2 → one 2-step group, one step dropped)."""
    import json

    from tests import reference_bridge as rb

    if not rb.reference_available():
        pytest.skip("reference repo not mounted")

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=1, val_batch_size=2, n_epoch=1,
                            max_es_cnt=10)
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train import loop as loop_mod

    orig_init = CaptionDataset.__init__

    def patched_init(self, c, split, **kw):
        orig_init(self, c, "val", **kw)
        self.split = split

    CaptionDataset.__init__ = patched_init
    try:
        loop_mod.train(cfg, str(tmp_path / "one"), max_steps_per_epoch=2,
                       eval_language=False, tensorboard=False)
        loop_mod.train(cfg.replace_train(steps_per_dispatch=2),
                       str(tmp_path / "multi"), max_steps_per_epoch=2,
                       eval_language=False, tensorboard=False)
    finally:
        CaptionDataset.__init__ = orig_init

    h1 = json.load(open(tmp_path / "one" / "history.json"))
    h2 = json.load(open(tmp_path / "multi" / "history.json"))
    np.testing.assert_allclose(h1[0]["train"]["loss_per_word"],
                               h2[0]["train"]["loss_per_word"], rtol=1e-5)
    np.testing.assert_allclose(h1[0]["val"]["loss_per_word"],
                               h2[0]["val"]["loss_per_word"], rtol=1e-5)


def test_train_loop_spd_accum_midepoch_resume(tmp_path):
    """Mid-epoch kill + resume under the FUSED dispatch×accum path
    (--steps_per_dispatch 2 --grad_accum_steps 2): saves land only at
    dispatch boundaries (multiples of spd*accum host batches), so the
    resume skip re-aligns the accumulation groups exactly — the resumed
    run lands on the uninterrupted trajectory bit-exact (5 host batches:
    one (2,2) dispatch, save, kill, resume into the (1,1) tail)."""
    import json
    import jax

    from tests import reference_bridge as rb

    if not rb.reference_available():
        pytest.skip("reference repo not mounted")

    # 5 videos need an isolated fixture dir: the shared one must stay at
    # <= 3 videos (fix_missing semantics would leak the extras into the
    # parity/serve/train-loop datasets — reference_bridge.setup_features)
    names, feat_dir, dur_file = rb.setup_features(5, tag="_spd5")
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=1, val_batch_size=2, n_epoch=1,
                            max_es_cnt=10, grad_accum_steps=2,
                            steps_per_dispatch=2,
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
        if what != "multi train step":
            return wrapped

        def bomb(*a, **k):
            if calls["n"] >= 1:  # first (2,2) dispatch succeeds
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
        # dispatch-boundary save: 4 host batches = 2 optimizer steps
        assert prog == {"epoch": 0, "batches_done": 4, "step": 2}

        res_b = loop_mod.train(
            cfg, str(tmp_path / "b"), eval_language=False,
            tensorboard=False,
            resume_from=str(tmp_path / "b" / "checkpoint_last"))
    finally:
        CaptionDataset.__init__ = orig_init

    a_leaves = jax.tree.leaves(jax.device_get(
        (res_a["state"].params, res_a["state"].opt_state,
         res_a["state"].ema_shadow)))
    b_leaves = jax.tree.leaves(jax.device_get(
        (res_b["state"].params, res_b["state"].opt_state,
         res_b["state"].ema_shadow)))
    assert len(a_leaves) == len(b_leaves)
    for la, lb in zip(a_leaves, b_leaves):
        assert np.array_equal(np.asarray(la), np.asarray(lb))
    assert int(res_a["state"].step) == int(res_b["state"].step) == 3
