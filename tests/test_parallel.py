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


def test_vocab_padding_is_neutral():
    """vocab_pad_multiple only changes parameter shapes: with the same
    weights (padding rows zero) the loss is bit-identical at an odd vocab
    size (round-1 VERDICT item 4 groundwork)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    base = tiny_test_config("full")
    cfg_u = base.replace_model(vocab_size=63)
    cfg_p = base.replace_model(vocab_size=63, vocab_pad_multiple=2)
    assert cfg_p.model.padded_vocab_size == 64
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg_u, batch_size=2, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    m_u, m_p = SVPCModel(cfg_u.model), SVPCModel(cfg_p.model)
    p_u = m_u.init(rngs, batch, deterministic=True)
    p_p = m_p.init(rngs, batch, deterministic=True)

    def pad_to(src, dst):
        src, dst = np.asarray(src), np.asarray(dst)
        if src.shape == dst.shape:
            return src
        out = np.zeros(dst.shape, src.dtype)
        out[tuple(slice(0, s) for s in src.shape)] = src
        return out

    p_pad = jax.tree.map(pad_to, p_u, jax.tree.map(np.asarray, p_p))
    g = {"gumbel": jax.random.PRNGKey(3)}
    l_u = float(m_u.apply(p_u, batch, deterministic=True, rngs=g).total_loss)
    l_p = float(m_p.apply(p_pad, batch, deterministic=True, rngs=g).total_loss)
    assert l_u == l_p


def test_dp_tp_gradient_parity_padded():
    """dp4 x tp2 with a tp-padded odd vocab: per-leaf gradients must match
    the single-device run, and the vocab/attention/FFN/head sharding rules
    must all actually fire (round-1 VERDICT item 4: TP was loss-only and
    silently replicated every vocab rule at odd V)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    cfg = tiny_test_config("full").replace_model(
        vocab_size=63, vocab_pad_multiple=2)
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
    grads_single = jax.jit(jax.grad(loss_fn))(params, batch)

    mesh = make_mesh(dp_size=4, tp_size=2)
    report = {}
    p_sharded = {"params": shard_params(mesh, params["params"], report)}
    # every family of rules fires — nothing silently replicated
    fired = "\n".join(f"{k}: {v}" for k, v in sorted(report.items()))
    assert not any(v.startswith("replicated") for v in report.values()), fired
    for want in ("word_embeddings/embedding", "query/kernel",
                 "intermediate/dense/kernel", "decoder_classifier/bias",
                 "decoder_classifier/decoder/kernel"):
        assert any(want in k for k in report), f"no rule fired for {want}"

    b_sharded = shard_batch(mesh, batch_np)
    tp_loss = float(jax.jit(loss_fn)(p_sharded, b_sharded))
    np.testing.assert_allclose(tp_loss, single, rtol=1e-5)
    grads_tp = jax.jit(jax.grad(loss_fn))(p_sharded, b_sharded)
    flat_s = jax.tree_util.tree_flatten_with_path(grads_single)[0]
    flat_t = jax.tree.leaves(grads_tp)
    assert len(flat_s) == len(flat_t)
    for (path, a), b in zip(flat_s, flat_t):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_tp_rules_cover_paper_config():
    """At the flagship geometry (hidden 768, 12 heads, V=951 padded to
    952) every TP rule applies without hitting the divisibility fallback —
    checked on abstract shapes, no compute."""
    import jax
    from svpc_tpu.config import Config, ModelConfig
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import param_partition_spec

    cfg = Config(model=ModelConfig(model_mode="full", vocab_pad_multiple=2))
    model = SVPCModel(cfg.model)
    batch = synthetic_batch(cfg, batch_size=1, seed=0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    abstract = jax.eval_shape(
        lambda: model.init(rngs, batch, deterministic=True))

    tp = 2
    sharded, replicated_vocab = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(abstract)[0]:
        spec = param_partition_spec(path)
        key = jax.tree_util.keystr(path)
        ok = all(leaf.shape[d] % tp == 0
                 for d, ax in enumerate(spec) if ax is not None)
        if spec != jax.sharding.PartitionSpec():
            (sharded if ok else replicated_vocab).append((key, leaf.shape))
    assert not replicated_vocab, replicated_vocab
    names = " ".join(k for k, _ in sharded)
    for want in ("query']['kernel", "key']['kernel", "value']['kernel",
                 "attention']['output']['dense']['kernel",
                 "intermediate']['dense']['kernel",
                 "decoder']['kernel", "word_embeddings']['embedding",
                 "action_embeddings"):
        assert want in names, f"{want} not sharded; sharded={names}"
    # the padded vocab dims really are 952
    flat = {jax.tree_util.keystr(p): l.shape for p, l
            in jax.tree_util.tree_flatten_with_path(abstract)[0]}
    emb = [s for k, s in flat.items()
           if "word_embeddings']['embedding" in k]
    assert all(s[0] == 952 for s in emb), emb


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


def test_resolve_spec_drops_nondivisible_pp_axis():
    """shard_params / zero1_partition_spec are public helpers callable on
    ad-hoc trees: a stacked ``layers`` leaf whose LAYER axis does not
    divide pp must fall back to replication on that axis instead of
    emitting an invalid P("pp", ...) spec that fails deep in device_put
    (round-4 ADVICE).  train()'s own trees never hit this (it validates
    pp | num_hidden_layers)."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from svpc_tpu.parallel.mesh import (_resolve_spec, make_mesh,
                                        shard_params, zero1_partition_spec)

    sizes = {"dp": 2, "pp": 2, "tp": 2}
    # pp dim itself non-divisible (3 layers, pp=2): pp must drop too
    assert _resolve_spec(P("pp", None, "tp"), (3, 4, 4), sizes) == \
        P(None, None, None)
    # tp fails, pp divides: pp survives the tp demotion
    assert _resolve_spec(P("pp", None, "tp"), (4, 4, 3), sizes) == \
        P("pp", None, None)
    # zero1 spec on the same ad-hoc leaf never keeps an invalid pp axis
    path = (jax.tree_util.DictKey("layers"),
            jax.tree_util.DictKey("dense"),
            jax.tree_util.DictKey("kernel"))
    spec = zero1_partition_spec(path, (3, 4, 4), sizes)
    assert "pp" not in jax.tree_util.tree_leaves(tuple(spec)) or \
        spec[0] != "pp"

    # and the whole placement path works end-to-end on such a tree
    mesh = make_mesh(dp_size=2, tp_size=2, pp_size=2)
    tree = {"layers": {"dense": {
        "kernel": np.zeros((3, 4, 4), np.float32)}}}
    placed = shard_params(mesh, tree)  # must not raise
    leaf = placed["layers"]["dense"]["kernel"]
    shard = leaf.addressable_shards[0].data
    assert shard.shape[0] == 3  # replicated on the layer axis


def test_multiprocess_assembly_mechanism():
    """The multi-process placement path (_assemble_from_index_map) builds
    the global array from per-device shards selected by the sharding's
    OWN index map — validate it equals plain device_put on every layout
    it must handle: dp on axis 0, tp-replicated rows (dp4×tp2), and the
    stacked (K, B, ...) batch where dp shards dim 1.  This exercises the
    exact code multi-host runs (minus the process filter, which only
    drops non-addressable devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from svpc_tpu.parallel.mesh import (
        _assemble_from_index_map, batch_sharding, make_mesh,
        stacked_batch_sharding)

    rng = np.random.RandomState(0)
    cases = []
    m8 = make_mesh(dp_size=8)
    cases.append((batch_sharding(m8), rng.randn(16, 5).astype(np.float32)))
    m42 = make_mesh(dp_size=4, tp_size=2)
    cases.append((batch_sharding(m42), rng.randn(8, 3, 2).astype(np.float32)))
    cases.append((stacked_batch_sharding(m8),
                  rng.randn(3, 8, 4).astype(np.float32)))  # dp on dim 1
    for sh, v in cases:
        got = _assemble_from_index_map(sh, v)
        want = jax.device_put(v, sh)
        assert got.sharding == want.sharding
        assert got.shape == v.shape
        np.testing.assert_array_equal(np.asarray(got), v)
        # the assembled array is usable inside jit like any sharded input
        np.testing.assert_allclose(
            float(jax.jit(jnp.sum)(got)), v.sum(), rtol=1e-5)
