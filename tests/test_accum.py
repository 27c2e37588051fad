"""Gradient accumulation: under the reference's sum-loss semantics
(model.py:1110-1115 sums over examples and steps), the accumulated
gradient of A microbatches equals the gradient of the one concatenated
batch exactly, and the resulting optimizer step matches make_train_step
on that big batch."""

import dataclasses

import numpy as np


def _zero_dropout(cfg):
    model = dataclasses.replace(cfg.model, hidden_dropout_prob=0.0,
                                attention_probs_dropout_prob=0.0)
    return dataclasses.replace(cfg, model=model)


def _concat(b1, b2):
    return {k: np.concatenate([b1[k], b2[k]], axis=0) for k in b1}


def test_accumulated_step_matches_big_batch():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import (make_apply_step, make_grad_step,
                                     make_train_step, tree_add)

    # "copy" mode: no gumbel reconstruction, and dropout is zeroed, so the
    # rng folding difference between the two paths cannot matter
    cfg = _zero_dropout(tiny_test_config("copy"))
    model = SVPCModel(cfg.model)

    b1 = synthetic_batch(cfg, batch_size=2, seed=0)
    b2 = synthetic_batch(cfg, batch_size=2, seed=1)
    big = {k: jnp.asarray(v) for k, v in _concat(b1, b2).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, big, deterministic=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=10)

    grad_step = jax.jit(make_grad_step(model, cfg))
    apply_step = jax.jit(make_apply_step(tx, cfg))
    train_step = jax.jit(make_train_step(model, tx, cfg))
    rng = jax.random.PRNGKey(7)

    # microbatch gradients sum to the big-batch gradient
    g1, m1 = grad_step(params["params"], {k: jnp.asarray(v)
                                          for k, v in b1.items()}, rng)
    g2, m2 = grad_step(params["params"], {k: jnp.asarray(v)
                                          for k, v in b2.items()}, rng)
    g_acc = jax.jit(tree_add)(g1, g2)
    g_big = jax.grad(
        lambda p: model.apply({"params": p}, big, deterministic=True,
                              rngs={"gumbel": rng}).total_loss
    )(params["params"])
    for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(g_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)

    # one apply on the accumulated grads == one train_step on the big batch
    state_a = TrainState.create(params, tx, use_ema=True)
    state_a, apply_m = apply_step(state_a, g_acc)
    grad_norm = apply_m["grad_norm"]
    assert int(apply_m["nonfinite_skipped"]) == 0
    state_b, m_big = train_step(TrainState.create(params, tx, use_ema=True),
                                big, rng)
    # metric sums across microbatches equal the big-batch metrics
    np.testing.assert_allclose(float(m1["loss"]) + float(m2["loss"]),
                               float(m_big["loss"]), rtol=1e-5)
    assert int(m1["n_correct"]) + int(m2["n_correct"]) == int(
        m_big["n_correct"])
    assert int(state_a.step) == int(state_b.step) == 1
    np.testing.assert_allclose(float(grad_norm), float(m_big["grad_norm"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(state_a.ema_shadow),
                    jax.tree.leaves(state_b.ema_shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_accumulation_under_dp_mesh():
    """Accumulated gradients on a dp=8 mesh equal the single-device
    big-batch gradient (composition of the two exactness properties)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from svpc_tpu.train.step import make_grad_step, tree_add

    assert len(jax.devices()) >= 8
    cfg = _zero_dropout(tiny_test_config("copy"))
    model = SVPCModel(cfg.model)
    b1 = synthetic_batch(cfg, batch_size=8, seed=0)
    b2 = synthetic_batch(cfg, batch_size=8, seed=1)
    big = {k: jnp.asarray(v) for k, v in _concat(b1, b2).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, big, deterministic=True)

    g_big = jax.grad(
        lambda p: model.apply({"params": p}, big, deterministic=True,
                              rngs={"gumbel": jax.random.PRNGKey(3)}
                              ).total_loss)(params["params"])

    mesh = make_mesh(dp_size=8)
    params_r = replicate(mesh, params)
    grad_step = jax.jit(make_grad_step(model, cfg))
    rng = jax.random.PRNGKey(7)
    g1, _ = grad_step(params_r["params"], shard_batch(mesh, b1), rng)
    g2, _ = grad_step(params_r["params"], shard_batch(mesh, b2), rng)
    g_acc = jax.jit(tree_add)(g1, g2)
    for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(g_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_nonfinite_update_skipped():
    """A step with nonfinite loss/grads must leave params, optimizer and
    EMA state untouched (and be counted) instead of poisoning them."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_apply_step, make_train_step

    cfg = _zero_dropout(tiny_test_config("copy"))
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=2, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=10)
    rng = jax.random.PRNGKey(7)

    # poison one parameter -> NaN loss and grads
    bad = jax.tree_util.tree_map(lambda x: x, params)
    leaves, treedef = jax.tree_util.tree_flatten(bad)
    leaves[0] = jnp.full_like(leaves[0], jnp.nan)
    bad = jax.tree_util.tree_unflatten(treedef, leaves)

    state = TrainState.create(bad, tx, use_ema=True)
    train_step = jax.jit(make_train_step(model, tx, cfg))
    new_state, m = train_step(state, batch, rng)
    assert int(m["nonfinite_skipped"]) == 1
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(new_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == 1  # step counter still advances

    # apply_step skips NaN accumulated grads the same way
    apply_step = jax.jit(make_apply_step(tx, cfg))
    good_state = TrainState.create(params, tx, use_ema=True)
    nan_grads = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan),
                             params["params"])
    applied, apply_m = apply_step(good_state, nan_grads)
    assert not bool(jnp.isfinite(apply_m["grad_norm"]))
    # the skip is reported in the apply metrics (visible under grad
    # accumulation — round-1 advisor finding)
    assert int(apply_m["nonfinite_skipped"]) == 1
    for a, b in zip(jax.tree.leaves(good_state.params),
                    jax.tree.leaves(applied.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a finite step still updates optimizer state (guard is a no-op when
    # healthy; params themselves don't move at step 0 because the warmup
    # schedule starts at lr multiplier 0)
    start = TrainState.create(params, tx, use_ema=True)
    healthy, m2 = train_step(start, batch, rng)
    assert int(m2["nonfinite_skipped"]) == 0
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(healthy.opt_state),
                 jax.tree.leaves(start.opt_state))]
    assert max(diffs) > 0


def test_full_parallel_stack_composition():
    """The whole production stack at once: dp2 x tp2 mesh (tp-padded odd
    vocab) + gradient accumulation + bf16 optimizer/EMA state.  The
    accumulated sharded gradients must match the single-device big-batch
    gradient, and the applied update (bf16 Adam state on the mesh) must
    match the same bf16 apply on one device."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import (make_apply_step, make_grad_step,
                                     tree_add)

    assert len(jax.devices()) >= 4
    cfg = _zero_dropout(tiny_test_config("copy")).replace_model(
        vocab_size=63, vocab_pad_multiple=2)
    cfg = cfg.replace_train(optimizer_dtype="bfloat16")
    model = SVPCModel(cfg.model)

    b1 = synthetic_batch(cfg, batch_size=4, seed=0)
    b2 = synthetic_batch(cfg, batch_size=4, seed=1)
    big = {k: jnp.asarray(v) for k, v in _concat(b1, b2).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, big, deterministic=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=10)
    rng = jax.random.PRNGKey(7)

    # ground truth: single-device big-batch gradient + bf16 apply
    g_big = jax.grad(
        lambda p: model.apply({"params": p}, big, deterministic=True,
                              rngs={"gumbel": rng}).total_loss
    )(params["params"])
    state_ref = TrainState.create(params, tx, use_ema=True,
                                  ema_dtype="bfloat16")
    apply_step = jax.jit(make_apply_step(tx, cfg))
    state_ref, _ = apply_step(state_ref, g_big)

    # mesh path: shard params per the tp rules, accumulate two sharded
    # microbatch gradients, apply on the mesh
    mesh = make_mesh(dp_size=2, tp_size=2)
    report = {}
    p_sharded = {"params": shard_params(mesh, params["params"],
                                        report=report)}
    assert any("tp" in v for v in report.values())  # rules actually fire
    grad_step = jax.jit(make_grad_step(model, cfg))
    g1, _ = grad_step(p_sharded["params"], shard_batch(mesh, b1), rng)
    g2, _ = grad_step(p_sharded["params"], shard_batch(mesh, b2), rng)
    g_acc = jax.jit(tree_add)(g1, g2)
    for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(g_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    state_mesh = TrainState.create(p_sharded, tx, use_ema=True,
                                   ema_dtype="bfloat16")
    state_mesh, m = apply_step(state_mesh, g_acc)
    assert int(m["nonfinite_skipped"]) == 0
    for a, b in zip(jax.tree.leaves(state_mesh.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(state_mesh.ema_shadow),
                    jax.tree.leaves(state_ref.ema_shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
