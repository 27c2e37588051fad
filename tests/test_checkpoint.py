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


def test_eval_adopts_sidecar_pad_and_opt_dtype():
    """A checkpoint trained with tp>1 (vocab tables padded via
    vocab_pad_multiple) and optimizer_dtype=bfloat16 must evaluate
    without the user re-passing those training-time flags:
    load_eval_model adopts them from the .cfg.json sidecar (otherwise the
    restore template's shapes/dtypes can't match the stored tree)."""
    import argparse

    import jax
    import jax.numpy as jnp
    from svpc_tpu.cli.common import load_eval_model
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState, save_checkpoint

    train_cfg = (tiny_test_config("copy")
                 .replace_model(vocab_pad_multiple=2)
                 .replace_train(optimizer_dtype="bfloat16"))
    model = SVPCModel(train_cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(train_cfg, batch_size=2,
                                         seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    tx = make_optimizer(train_cfg.train, steps_per_epoch=4)
    state = TrainState.create(params, tx, use_ema=True,
                              ema_dtype="bfloat16")

    class FakeDS:
        def __len__(self):
            return 2

        def batches(self, bs):
            yield batch, None

    with tempfile.TemporaryDirectory() as d:
        path = save_checkpoint(d, jax.device_get(state), train_cfg,
                               name="ckpt")
        # eval-side cfg: user passed NEITHER --tp_size nor
        # --optimizer_dtype (the defaults)
        eval_cfg = tiny_test_config("copy")
        args = argparse.Namespace(checkpoint=path, torch_checkpoint=False)
        got_cfg, _, eval_params, _ = load_eval_model(
            eval_cfg, args, lambda c: FakeDS())

    assert got_cfg.model.vocab_pad_multiple == 2
    assert got_cfg.train.optimizer_dtype == "bfloat16"
    # EMA shadow restored (bf16) and widened for eval
    leaves = jax.tree.leaves(eval_params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    # padded table shape survived the roundtrip
    padded = [l for l in jax.tree.leaves(eval_params)
              if l.ndim == 2 and l.shape[0] % 2 == 0
              and l.shape[0] >= train_cfg.model.vocab_size]
    assert padded, "expected a tp-padded vocab-sized table in eval params"
