"""ZeRO-1 optimizer-state sharding (parallel/mesh.py::shard_state_zero1).

The reference has no distributed optimizer (SURVEY §2.4: zero distributed
code).  Here the Adam moments + EMA shadow shard over the dp axis while
gradients stay replicated, so the update math — including the per-leaf and
global grad-norm clips, which need FULL gradient norms — is identical to
the replicated run.  These tests check (a) multi-step training-state
parity against single-device execution, (b) that the moments really are
dp-sharded (per-device shards are 1/dp of the leaf), and (c) composition
with tp and with bf16 optimizer state.
"""

import numpy as np
import pytest


def _setup(mode="reason_copy", batch_size=8, seed=0):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config(mode)
    model = SVPCModel(cfg.model)
    batch_np = synthetic_batch(cfg, batch_size=batch_size, seed=seed)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = model.init(rngs, batch, deterministic=True)
    return cfg, model, params, batch_np


def _adam_state(opt_state):
    """The BertAdamState inside the optax chain tuple."""
    for s in opt_state:
        if hasattr(s, "m") and hasattr(s, "v"):
            return s
    raise AssertionError(f"no BertAdamState in {type(opt_state)}")


def _make_step(model, cfg, opt_dtype="float32"):
    """Deterministic train step (no dropout/gumbel noise) so dp vs single
    device compare real optimizer trajectories, not RNG streams."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax
    from svpc_tpu.train.optim import ema_update, make_optimizer

    tcfg = dataclasses.replace(cfg.train, optimizer_dtype=opt_dtype)
    tx = make_optimizer(tcfg, steps_per_epoch=10)

    def step(state, batch):
        def loss_fn(p):
            out = model.apply({"params": p}, batch, deterministic=True,
                              rngs={"gumbel": jax.random.PRNGKey(3)})
            return out.total_loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params["params"])
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        new_shadow = ema_update(state.ema_shadow, new_params,
                                state.step.astype(jnp.float32), 0.9999)
        return state.replace(params={"params": new_params},
                             opt_state=new_opt, ema_shadow=new_shadow,
                             step=state.step + 1), loss

    return tx, step


def _assert_tree_close(a, b, rtol=2e-4, atol=1e-5):
    import jax
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, x), y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(x, np.float32),
            rtol=rtol, atol=atol, err_msg=jax.tree_util.keystr(path))


def test_zero1_matches_single_device():
    """3 optimizer steps under dp=8 ZeRO-1 == single-device trajectory
    (params, Adam moments, EMA shadow)."""
    import jax
    from svpc_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        shard_params, shard_state_zero1,
                                        state_shardings)
    from svpc_tpu.train.state import TrainState

    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    cfg, model, params, batch_np = _setup()
    tx, step = _make_step(model, cfg)

    single = TrainState.create(params, tx, use_ema=True)
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    jstep = jax.jit(step)
    for _ in range(3):
        single, loss_s = jstep(single, batch)

    mesh = make_mesh(dp_size=8)
    state = TrainState.create(params, tx, use_ema=True)
    state = shard_params(mesh, state)
    state = shard_state_zero1(mesh, state)
    # the moments really shard: per-device piece is 1/8 of the leaf
    m_tree = _adam_state(state.opt_state).m
    big = [x for x in jax.tree.leaves(m_tree) if x.size >= 64]
    assert big, "no moment leaf large enough to check"
    for x in big:
        shard = x.addressable_shards[0].data
        assert shard.size * 8 == x.size, (x.shape, shard.shape)
    jstep_dp = jax.jit(step, out_shardings=(
        state_shardings(state),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    bs = shard_batch(mesh, batch_np)
    for _ in range(3):
        state, loss_d = jstep_dp(state, bs)

    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-5)
    _assert_tree_close(single.params, state.params)
    _assert_tree_close(single.ema_shadow, state.ema_shadow)
    _assert_tree_close(_adam_state(single.opt_state).m, _adam_state(state.opt_state).m)
    _assert_tree_close(_adam_state(single.opt_state).v, _adam_state(state.opt_state).v)
    # the pinned layout persisted across steps
    for x in jax.tree.leaves(_adam_state(state.opt_state).m):
        if x.size >= 64:
            assert x.addressable_shards[0].data.size * 8 == x.size


def test_zero1_composes_with_tp_and_bf16_state():
    """dp4 x tp2 + ZeRO-1 + bf16 moments: trajectory matches the
    single-device bf16-state run; tp-sharded moment leaves fold dp into a
    free dimension."""
    import jax
    from jax.sharding import PartitionSpec as P
    from svpc_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        shard_params, shard_state_zero1,
                                        state_shardings)
    from svpc_tpu.train.state import TrainState

    cfg, model, params, batch_np = _setup(mode="full", batch_size=4, seed=3)
    tx, step = _make_step(model, cfg, opt_dtype="bfloat16")

    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    single = TrainState.create(params, tx, use_ema=True,
                               ema_dtype="bfloat16")
    jstep = jax.jit(step)
    for _ in range(2):
        single, loss_s = jstep(single, batch)

    mesh = make_mesh(dp_size=4, tp_size=2)
    state = TrainState.create(params, tx, use_ema=True,
                              ema_dtype="bfloat16")
    state = shard_params(mesh, state)
    state = shard_state_zero1(mesh, state)
    # at least one moment leaf carries BOTH axes (tp layout + dp fold)
    specs = [x.sharding.spec for x in jax.tree.leaves(_adam_state(state.opt_state).m)]
    flat_axes = [set(ax for dim in s if dim is not None
                     for ax in (dim if isinstance(dim, tuple) else (dim,)))
                 for s in specs]
    assert any(a == {"dp", "tp"} for a in flat_axes), specs
    jstep_dp = jax.jit(step, out_shardings=(
        state_shardings(state),
        jax.sharding.NamedSharding(mesh, P())))
    bs = shard_batch(mesh, batch_np)
    for _ in range(2):
        state, loss_d = jstep_dp(state, bs)

    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-5)
    _assert_tree_close(single.params, state.params)
    _assert_tree_close(single.ema_shadow, state.ema_shadow,
                       rtol=1e-2, atol=1e-3)  # bf16-held state


def test_zero1_spec_covers_flagship_geometry():
    """At the paper config every moment leaf >= 8 elements finds a dp
    dimension (no silent replication of the big state) — abstract shapes
    only, no compute."""
    import jax
    from svpc_tpu.config import Config, ModelConfig
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import zero1_partition_spec

    cfg = Config(model=ModelConfig(model_mode="full", vocab_pad_multiple=2))
    model = SVPCModel(cfg.model)
    batch = synthetic_batch(cfg, batch_size=1, seed=0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    abstract = jax.eval_shape(
        lambda: model.init(rngs, batch, deterministic=True))

    mesh_axes = {"dp": 4, "tp": 2}
    replicated, sharded_elems, total_elems = [], 0, 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(abstract)[0]:
        spec = zero1_partition_spec(path, leaf.shape, mesh_axes)
        axes = [ax for dim in spec if dim is not None
                for ax in (dim if isinstance(dim, tuple) else (dim,))]
        total_elems += leaf.size
        if "dp" in axes:
            sharded_elems += leaf.size
        elif leaf.size >= 8:
            replicated.append((jax.tree_util.keystr(path), leaf.shape))
    # a handful of tiny odd-sized leaves may replicate; the big state must
    # not (>=99% of elements dp-sharded)
    assert sharded_elems / total_elems > 0.99, (
        sharded_elems / total_elems, replicated[:10])


@pytest.mark.parametrize("tp", [1, 2])
def test_zero1_composes_with_pp(tp):
    """--zero1 --pp_size (round-3 VERDICT item 5): on a dp2×pp2 mesh —
    and, at tp=2, the FULL 3-axis dp2×pp2×tp2 mesh — with
    pipeline-RESIDENT stacked trunks, the Adam moments + EMA shard over
    the pp layer axis (+ tp rules) with dp folded into a free dim, and
    the 3-step trajectory tracks the single-device run."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        shard_params, shard_state_zero1,
                                        state_shardings)
    from svpc_tpu.parallel.pipeline import (stack_trunk_params,
                                            unstack_trunk_params)
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.state import TrainState

    assert len(jax.devices()) >= 4 * tp
    cfg, model, params, batch_np = _setup(mode="full", batch_size=4,
                                          seed=5)
    cfg = cfg.replace_model(num_hidden_layers=4)
    cfg = cfg.replace_train(dp_size=2, tp_size=tp, pp_size=2, zero1=True)
    # re-init at 4 layers (the _setup init used 2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    model = SVPCModel(cfg.model)
    params = model.init(rngs, batch, deterministic=True)
    tx, step = _make_step(model, cfg)

    single = TrainState.create(params, tx, use_ema=True)
    jstep = jax.jit(step)
    for _ in range(3):
        single, loss_s = jstep(single, batch)

    mesh = make_mesh(dp_size=2, tp_size=tp, pp_size=2)
    pp_model = SVPCModel(cfg.model, pp_mesh=mesh)
    _, step_pp = _make_step(pp_model, cfg)
    stacked = {"params": stack_trunk_params(params["params"])}
    state = TrainState.create(stacked, tx, use_ema=True)
    state = shard_params(mesh, state)
    state = shard_state_zero1(mesh, state)
    # a stacked moment leaf carries BOTH pp and dp
    m_tree = _adam_state(state.opt_state).m
    import jax.tree_util as jtu
    stacked_m = [(p, x) for p, x in jtu.tree_flatten_with_path(m_tree)[0]
                 if any(getattr(k, "key", None) == "layers" for k in p)]
    assert stacked_m
    axes_seen = set()
    for p, x in stacked_m:
        for dim in x.sharding.spec:
            for ax in (dim if isinstance(dim, tuple) else (dim,)):
                if ax:
                    axes_seen.add(ax)
    assert {"pp", "dp"} <= axes_seen, axes_seen
    # and really stores at most 1/(dp*pp) on big leaves
    big = [x for _, x in stacked_m if x.size >= 4096]
    assert big
    for x in big:
        assert x.addressable_shards[0].data.size * 4 <= x.size

    jstep_pp = jax.jit(step_pp, out_shardings=(
        state_shardings(state),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
    bs = shard_batch(mesh, batch_np)
    for _ in range(3):
        state, loss_d = jstep_pp(state, bs)

    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-5)
    got = unstack_trunk_params(jax.device_get(state.params))
    _assert_tree_close(single.params, got)
    got_ema = unstack_trunk_params(jax.device_get(state.ema_shadow))
    _assert_tree_close(single.ema_shadow, got_ema)


def test_zero1_train_loop_with_resume(tmp_path):
    """The real train() loop under dp=2 + ZeRO-1, including resume: the
    checkpoint (always gathered to host) restores, is re-placed on the
    mesh (shard_params then shard_state_zero1), and the pinned
    out_shardings keep the layout across steps — this is the wiring the
    dryrun's device-mismatch failure mode lives in."""
    import json

    import numpy as np
    import pytest
    from tests import reference_bridge as rb

    if not rb.reference_available():
        pytest.skip("reference repo not mounted")

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, _ = rb.build_ours("copy", feat_dir, dur_file)
    cfg = cfg.replace_train(batch_size=2, val_batch_size=2, n_epoch=2,
                            max_es_cnt=10, dp_size=2, zero1=True)
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train import loop as loop_mod

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

    hist = json.load(open(tmp_path / "history.json"))
    assert [h["epoch"] for h in hist] == [0, 1, 2, 3]
    for h in hist:
        assert np.isfinite(h["train"]["loss_per_word"])
