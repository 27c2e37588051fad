"""Packed-clip layout (data/packing.py) must reproduce the dense layout
exactly: same losses, same metric counts, same greedy tokens — the packed
path only removes computation on padded step slots (and, with video-span
bucketing, on padded video token columns), never changes what is computed
on real clips."""

import numpy as np
import pytest

MODES = ["video", "copy", "reason_copy", "full"]


def _setup(mode, seed=3, batch_size=3):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config(mode)
    model = SVPCModel(cfg.model)
    dense_np = synthetic_batch(cfg, batch_size, seed=seed)
    dense = {k: jnp.asarray(v) for k, v in dense_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, dense, deterministic=True)
    return cfg, model, params, dense_np, dense


def _patch_zero_gumbel(monkeypatch):
    """Dense and packed draw different gumbel noise shapes; zero the noise
    so the stochastic re-simulation path becomes comparable."""
    import jax
    import jax.numpy as jnp
    import svpc_tpu.model.svpc as svpc_mod

    def det(rng, logits, tau, axis=-1):
        y = jax.nn.softmax(logits / tau, axis=axis)
        hard = jax.nn.one_hot(jnp.argmax(y, axis=axis), logits.shape[axis],
                              dtype=y.dtype, axis=axis)
        return jax.lax.stop_gradient(hard - y) + y

    monkeypatch.setattr(svpc_mod, "gumbel_softmax_st", det)


@pytest.mark.parametrize("mode", MODES)
def test_packed_forward_matches_dense(mode, monkeypatch):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch

    _patch_zero_gumbel(monkeypatch)
    cfg, model, params, dense_np, dense = _setup(mode)
    packed = {k: jnp.asarray(v)
              for k, v in pack_batch(dense_np, cfg.model.max_t_len,
                                     clip_multiple=4).items()}

    g = {"gumbel": jax.random.PRNGKey(7)}
    out_d = model.apply(params, dense, deterministic=True, rngs=g)
    out_p = model.apply(params, packed, deterministic=True, rngs=g)

    for field in ("total_loss", "caption_loss", "entity_loss", "action_loss",
                  "re_entity_loss", "re_action_loss"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_d, field)),
            np.asarray(getattr(out_p, field)), rtol=2e-5, atol=1e-5,
            err_msg=f"{mode}: {field}")

    # reasoner outputs are per-video either way — compare on valid steps
    if out_d.ent_probs is not None:
        m = dense_np["step_mask"][..., None]
        np.testing.assert_allclose(
            np.asarray(out_d.ent_probs) * m, np.asarray(out_p.ent_probs) * m,
            rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", MODES)
def test_packed_metrics_match_dense(mode, monkeypatch):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.train.step import batch_metrics

    _patch_zero_gumbel(monkeypatch)
    cfg, model, params, dense_np, dense = _setup(mode, seed=11)
    packed = {k: jnp.asarray(v)
              for k, v in pack_batch(dense_np, cfg.model.max_t_len,
                                     clip_multiple=4).items()}
    g = {"gumbel": jax.random.PRNGKey(7)}
    out_d = model.apply(params, dense, deterministic=True, rngs=g)
    out_p = model.apply(params, packed, deterministic=True, rngs=g)
    m_d = batch_metrics(out_d, dense, cfg)
    m_p = batch_metrics(out_p, packed, cfg)
    assert set(m_d) == set(m_p)
    for k in m_d:
        np.testing.assert_allclose(np.asarray(m_d[k]), np.asarray(m_p[k]),
                                   rtol=2e-5, atol=1e-5, err_msg=k)


@pytest.mark.parametrize("mode", MODES)
def test_packed_greedy_matches_dense(mode):
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.decode.greedy import greedy_decode

    cfg, model, params, dense_np, dense = _setup(mode, seed=5)
    packed = {k: jnp.asarray(v)
              for k, v in pack_batch(dense_np, cfg.model.max_t_len,
                                     clip_multiple=4).items()}

    ids_d = np.asarray(greedy_decode(model, params, dense))
    ids_p = np.asarray(greedy_decode(model, params, packed))
    # dense emits tokens for padded steps too; packed zeroes them
    mask = dense_np["step_mask"][..., None].astype(ids_d.dtype)
    np.testing.assert_array_equal(ids_d * mask, ids_p)


def test_video_span_bucketing_matches_full():
    """Slicing the video token span to the batch-max bucket must not change
    losses or greedy tokens (padded keys are additively masked to zero
    probability)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.decode.greedy import greedy_decode

    cfg, model, params, dense_np, dense = _setup("copy", seed=9)
    Lv = cfg.model.max_v_len

    # cap every clip's valid video length so a smaller bucket is legal
    small = 4  # [CLS] + 2 video + [SEP]
    dnp = {k: v.copy() for k, v in dense_np.items()}
    dnp["input_mask"][:, :, small:Lv] = 0.0
    dnp["input_ids"][:, :, small - 1] = 2      # [SEP] at the new end
    dnp["input_ids"][:, :, small:Lv] = 0
    dnp["video_feature"][:, :, small:] = 0.0
    dense2 = {k: jnp.asarray(v) for k, v in dnp.items()}

    packed_full = {k: jnp.asarray(v)
                   for k, v in pack_batch(dnp, cfg.model.max_t_len,
                                          v_len=Lv, clip_multiple=4).items()}
    packed_small = {k: jnp.asarray(v)
                    for k, v in pack_batch(dnp, cfg.model.max_t_len,
                                           v_len=small,
                                           clip_multiple=4).items()}
    assert packed_small["clip_input_ids"].shape[-1] \
        == small + cfg.model.max_t_len

    g = {"gumbel": jax.random.PRNGKey(7)}
    loss_full = model.apply(params, packed_full, deterministic=True,
                            rngs=g).caption_loss
    loss_small = model.apply(params, packed_small, deterministic=True,
                             rngs=g).caption_loss
    np.testing.assert_allclose(np.asarray(loss_full), np.asarray(loss_small),
                               rtol=2e-5)

    ids_full = np.asarray(greedy_decode(model, params, dense2))
    ids_small = np.asarray(greedy_decode(model, params, packed_small))
    mask = dnp["step_mask"][..., None].astype(ids_full.dtype)
    np.testing.assert_array_equal(ids_full * mask, ids_small)


def test_pack_batch_roundtrip():
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.packing import pack_batch, unpack_ids
    from svpc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_test_config("full")
    dense = synthetic_batch(cfg, 4, seed=1)
    T = cfg.model.max_t_len
    packed = pack_batch(dense, T, clip_multiple=4)

    n_real = int(dense["step_mask"].sum())
    assert packed["clip_mask"].sum() == n_real
    assert packed["clip_input_ids"].shape[0] % 4 == 0

    # scatter the packed text ids back and compare to the dense text span
    S = dense["step_mask"].shape[1]
    Lv = cfg.model.max_v_len
    text = unpack_ids(packed["clip_input_ids"][:, -T:], packed, S)
    want = dense["input_ids"][:, :, Lv:] * \
        dense["step_mask"][..., None].astype(np.int32)
    np.testing.assert_array_equal(text, want)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_packed_equivalence_randomized(seed):
    """Sweep random batch compositions (sizes, step counts, entity/OOV
    structure) through dense-vs-packed loss equality in one jit each."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    rng = np.random.RandomState(seed)
    mode = ["video", "copy", "reason_copy"][seed % 3]
    cfg = tiny_test_config(mode)
    model = SVPCModel(cfg.model)
    bs = int(rng.randint(1, 5))
    dense_np = synthetic_batch(cfg, bs, seed=seed * 7)
    dense = {k: jnp.asarray(v) for k, v in dense_np.items()}
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, dense, deterministic=True)
    packed = {k: jnp.asarray(v)
              for k, v in pack_batch(dense_np, cfg.model.max_t_len,
                                     clip_multiple=int(rng.choice([2, 4, 8]))
                                     ).items()}
    g = {"gumbel": jax.random.PRNGKey(9)}
    out_d = model.apply(params, dense, deterministic=True, rngs=g)
    out_p = model.apply(params, packed, deterministic=True, rngs=g)
    np.testing.assert_allclose(np.asarray(out_d.total_loss),
                               np.asarray(out_p.total_loss),
                               rtol=2e-5, atol=1e-5)


def test_pack_examples_equals_pack_batch():
    """The direct example->packed builder must produce bit-identical
    batches to stack + pad + pack_batch (incl. dp sharding + partial
    batches padded up)."""
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.packing import pack_batch, pack_examples
    from svpc_tpu.data.pipeline import Example, batch_examples, pad_batch_to
    from svpc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_test_config("full")
    T = cfg.model.max_t_len
    bn = synthetic_batch(cfg, 5, seed=13)
    exs = [Example(arrays={k: v[i] for k, v in bn.items()}, meta={})
           for i in range(5)]
    for B, dp in [(5, 1), (8, 4), (6, 2)]:
        dense = pad_batch_to(batch_examples(exs), B)
        want = pack_batch(dense, T, clip_multiple=4, dp_shards=dp)
        got = pack_examples(exs, T, batch_size=B, clip_multiple=4,
                            dp_shards=dp)
        assert set(want) == set(got)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k],
                                          err_msg=f"B={B} dp={dp}: {k}")
