"""Layer rematerialization (ModelConfig.remat → nn.remat in
model/layers.py): jax.checkpoint trades activation memory for recompute
without changing any value — loss, gradients, and greedy decode must be
identical to the un-rematted model with the same parameters."""

import numpy as np


def test_remat_loss_and_grads_match():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config("full")
    cfg_r = cfg.replace_model(remat=True)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=4, seed=1).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    model, model_r = SVPCModel(cfg.model), SVPCModel(cfg_r.model)
    params = model.init(rngs, batch, deterministic=True)
    # identical param tree: remat only wraps the apply, not the params
    abstract_r = jax.eval_shape(
        lambda: model_r.init(rngs, batch, deterministic=True))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(abstract_r))

    def loss(m):
        def f(p):
            return m.apply(p, batch, deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss
        return f

    l0, g0 = jax.jit(jax.value_and_grad(loss(model)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(loss(model_r)))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree.leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        # XLA fuses the recompute path differently, so f32 reassociation
        # noise of a few ulps is expected on isolated elements
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_remat_greedy_decode_identical():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.decode.greedy import greedy_decode
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config("full")
    cfg_r = cfg.replace_model(remat=True)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=2, seed=5).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    model, model_r = SVPCModel(cfg.model), SVPCModel(cfg_r.model)
    params = model.init(rngs, batch, deterministic=True)
    ids0 = np.asarray(jax.jit(
        lambda p, b: greedy_decode(model, p, b))(params, batch))
    ids1 = np.asarray(jax.jit(
        lambda p, b: greedy_decode(model_r, p, b))(params, batch))
    np.testing.assert_array_equal(ids0, ids1)
