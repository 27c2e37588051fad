"""Checkpoint save/restore roundtrip (true resume — absent in the
reference, SURVEY §5)."""

import os
import tempfile

import numpy as np


def test_checkpoint_roundtrip():
    import functools
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import (TrainState, load_checkpoint,
                                      save_checkpoint)
    from svpc_tpu.train.step import make_train_step

    cfg = tiny_test_config("copy")
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=2, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    tx = make_optimizer(cfg.train, steps_per_epoch=4)
    state = TrainState.create(params, tx, use_ema=True)

    step = jax.jit(make_train_step(model, tx, cfg))
    state, _ = step(state, batch, jax.random.PRNGKey(5))
    state, _ = step(state, batch, jax.random.PRNGKey(5))

    with tempfile.TemporaryDirectory() as d:
        path = save_checkpoint(d, jax.device_get(state), cfg, name="ckpt")
        assert os.path.exists(path)
        assert os.path.exists(path + ".cfg.json")

        # restore into an abstract template (the CLI path)
        abs_params = jax.eval_shape(
            lambda: model.init(rngs, batch, deterministic=True))
        template = jax.eval_shape(functools.partial(
            TrainState.create, tx=tx, use_ema=True), abs_params)
        restored = load_checkpoint(path, template)

    assert int(restored.step) == int(state.step) == 2
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_shadow),
                    jax.tree.leaves(restored.ema_shadow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues deterministically
    s1, m1 = step(state, batch, jax.random.PRNGKey(6))
    s2, m2 = step(restored, batch, jax.random.PRNGKey(6))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
