"""Data-parallel correctness: the dp=8 mesh must produce the same loss and
gradients as single-device execution (losses are sums, so this is exact up
to reduction order)."""

import numpy as np
import pytest


def test_dp_loss_matches_single_device():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"

    cfg = tiny_test_config("reason_copy")
    model = SVPCModel(cfg.model)
    batch_np = synthetic_batch(cfg, batch_size=8, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    def loss_fn(p, b):
        return model.apply(p, b, deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss

    single = jax.jit(loss_fn)(params, batch)
    grads_single = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)))(params, batch)

    mesh = make_mesh(dp_size=8)
    params_r = replicate(mesh, params)
    batch_s = shard_batch(mesh, batch_np)
    dp = jax.jit(loss_fn)(params_r, batch_s)
    grads_dp = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)))(params_r, batch_s)

    np.testing.assert_allclose(float(dp), float(single), rtol=1e-5)
    flat_s = jax.tree.leaves(grads_single)
    flat_d = jax.tree.leaves(grads_dp)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_dp_tp_loss_matches_single_device():
    """dp4 x tp2 (Megatron-style FFN/table sharding) must reproduce the
    single-device loss."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    cfg = tiny_test_config("full")
    model = SVPCModel(cfg.model)
    batch_np = synthetic_batch(cfg, batch_size=4, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    def loss_fn(p, b):
        return model.apply(p, b, deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss

    single = float(jax.jit(loss_fn)(params, batch))

    mesh = make_mesh(dp_size=4, tp_size=2)
    p_sharded = {"params": shard_params(mesh, params["params"])}
    b_sharded = shard_batch(mesh, batch_np)
    tp_loss = float(jax.jit(loss_fn)(p_sharded, b_sharded))
    np.testing.assert_allclose(tp_loss, single, rtol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_entry_driver_env():
    """Run the entry exactly as the driver does: a fresh process with NO
    cpu-forcing env (conftest's overrides scrubbed), so the ambient TPU
    platform is the default.  dryrun_multichip must be hermetic — it
    re-execs itself with the CPU host platform forced (round-1 VERDICT
    item 1: MULTICHIP_r01 was red because batch arrays committed to the
    default axon device)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("_SVPC_DRYRUN_INNER", None)
    entry = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    proc = subprocess.run([sys.executable, entry, "8"], env=env,
                          capture_output=True, text=True, timeout=580)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_packed_dp_loss_matches_single_device():
    """Per-shard clip packing under the dp mesh (data/packing.py
    dp_shards>1) must reproduce the dense single-device loss — every clip
    lands on the shard owning its video's per-video arrays."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    cfg = tiny_test_config("reason_copy")
    model = SVPCModel(cfg.model)
    batch_np = synthetic_batch(cfg, batch_size=8, seed=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    def loss_fn(p, b):
        return model.apply(p, b, deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss

    single = float(jax.jit(loss_fn)(params, batch))

    packed_np = pack_batch(batch_np, cfg.model.max_t_len, clip_multiple=2,
                           dp_shards=8)
    assert packed_np["clip_video"].shape[0] % 8 == 0

    mesh = make_mesh(dp_size=8)
    params_r = replicate(mesh, params)
    batch_s = shard_batch(mesh, packed_np)
    dp = float(jax.jit(loss_fn)(params_r, batch_s))
    np.testing.assert_allclose(dp, single, rtol=1e-5)


def test_multihost_helper_single_process():
    """shard_batch_multihost reduces to shard_batch on one process and
    produces identically-valued, dp-sharded arrays."""
    import jax
    import numpy as np
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        shard_batch_multihost)

    cfg = tiny_test_config("video")
    batch_np = synthetic_batch(cfg, batch_size=8, seed=4)
    mesh = make_mesh(dp_size=8)
    a = shard_batch(mesh, batch_np)
    b = shard_batch_multihost(mesh, batch_np)
    assert jax.process_count() == 1
    for k in batch_np:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
