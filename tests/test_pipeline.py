"""Pipeline parallelism (parallel/pipeline.py): the GPipe primitive must
reproduce the sequential layer stack exactly — outputs AND gradients —
on a real multi-device mesh, including composed with data parallelism.

The stage body is the model's own EncoderLayer, so this exercises the
actual trunk a deeper SVPC variant would pipeline (docs/DESIGN.md §5).
"""

import numpy as np
import pytest


def _setup(n_layers=8, B=4, L=6, seed=0):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.parallel.pipeline import (
        encoder_stage_fn, init_stacked_encoder)

    cfg = tiny_test_config("video").model
    rng = jax.random.PRNGKey(seed)
    stacked = init_stacked_encoder(cfg, rng, n_layers, (B, L))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (B, L, cfg.hidden_size), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(seed + 2), (B, L))
            > 0.2).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    return cfg, stacked, x, mask, encoder_stage_fn(cfg)


def _sequential(stage_fn, stacked, act):
    """Ground truth: apply the stacked layers one after another."""
    import jax
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n_layers):
        p_i = jax.tree_util.tree_map(lambda a: a[i], stacked)
        act = stage_fn(p_i, act)
    return act


def test_gpipe_forward_matches_sequential():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.parallel.pipeline import gpipe
    from svpc_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8
    cfg, stacked, x, mask, stage_fn = _setup()

    ref_y, _ = _sequential(stage_fn, stacked, (x, mask))

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("pp",))
    n_micro = 4
    mbs = (x.reshape(n_micro, -1, *x.shape[1:]),
           mask.reshape(n_micro, -1, mask.shape[1]))
    out, out_mask = jax.jit(
        lambda p, m: gpipe(stage_fn, p, m, mesh))(stacked, mbs)

    np.testing.assert_allclose(np.asarray(out).reshape(ref_y.shape),
                               np.asarray(ref_y), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out_mask).reshape(mask.shape), np.asarray(mask))


def test_gpipe_gradients_match_sequential():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.parallel.pipeline import gpipe

    assert len(jax.devices()) >= 8
    cfg, stacked, x, mask, stage_fn = _setup()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("pp",))
    n_micro = 4
    mbs = (x.reshape(n_micro, -1, *x.shape[1:]),
           mask.reshape(n_micro, -1, mask.shape[1]))

    # sum-loss over outputs — microbatching must be exact under sums
    def loss_pipe(p):
        y, _ = gpipe(stage_fn, p, mbs, mesh)
        return jnp.sum(y ** 2)

    def loss_seq(p):
        y, _ = _sequential(stage_fn, p, (x, mask))
        return jnp.sum(y ** 2)

    l_p, g_p = jax.jit(jax.value_and_grad(loss_pipe))(stacked)
    l_s, g_s = jax.jit(jax.value_and_grad(loss_seq))(stacked)

    np.testing.assert_allclose(float(l_p), float(l_s), rtol=1e-6)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_s))
    assert flat_p and len(flat_p) == len(flat_s)
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]),
            rtol=2e-5, atol=1e-5,  # microbatch reduction-order noise
            err_msg=jax.tree_util.keystr(path))


def test_gpipe_composes_with_dp():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.parallel.pipeline import gpipe

    assert len(jax.devices()) >= 8
    cfg, stacked, x, mask, stage_fn = _setup(n_layers=4, B=8)
    ref_y, _ = _sequential(stage_fn, stacked, (x, mask))

    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "pp"))
    n_micro = 2
    mbs = (x.reshape(n_micro, -1, *x.shape[1:]),
           mask.reshape(n_micro, -1, mask.shape[1]))
    out, _ = jax.jit(lambda p, m: gpipe(
        stage_fn, p, m, mesh, batch_axis="dp"))(stacked, mbs)

    np.testing.assert_allclose(np.asarray(out).reshape(ref_y.shape),
                               np.asarray(ref_y), rtol=1e-6, atol=1e-6)


def test_gpipe_remat_matches():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.parallel.pipeline import gpipe

    cfg, stacked, x, mask, stage_fn = _setup(n_layers=4)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("pp",))
    mbs = (x.reshape(2, -1, *x.shape[1:]),
           mask.reshape(2, -1, mask.shape[1]))

    def loss(p, remat):
        y, _ = gpipe(stage_fn, p, mbs, mesh, remat=remat)
        return jnp.sum(y ** 2)

    g_plain = jax.jit(jax.grad(lambda p: loss(p, False)))(stacked)
    g_remat = jax.jit(jax.grad(lambda p: loss(p, True)))(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)  # remat changes fusion order


def test_gpipe_layer_count_must_divide():
    import jax
    from svpc_tpu.parallel.pipeline import gpipe

    cfg, stacked, x, mask, stage_fn = _setup(n_layers=3)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("pp",))
    mbs = (x.reshape(2, -1, *x.shape[1:]),
           mask.reshape(2, -1, mask.shape[1]))
    with pytest.raises(ValueError, match="divide"):
        gpipe(stage_fn, stacked, mbs, mesh)
