"""Optimizer parity: our optax BertAdam-chain vs the reference BertAdam,
and the EMA schedule, on a tiny quadratic problem."""

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_bert_adam_matches_reference():
    import torch
    import jax
    import jax.numpy as jnp
    from tools.reference_harness import install_patches
    install_patches()
    import sys
    sys.path.insert(0, rb.REFERENCE_ROOT)
    from src.rtransformer.optimization import BertAdam

    rng = np.random.RandomState(0)
    w0 = rng.randn(6, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    x = rng.randn(16, 6).astype(np.float32)
    y = rng.randn(16, 4).astype(np.float32)

    # --- torch side (params grouped like train.py:339-343) ---
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    groups = [
        {"params": [tw], "weight_decay": 0.01},
        {"params": [tb], "weight_decay": 0.0},   # 'bias' group
    ]
    opt = BertAdam(groups, lr=1e-3, warmup=0.2, t_total=50,
                   schedule="warmup_linear")
    tx_ = torch.from_numpy(x)
    ty = torch.from_numpy(y)
    for _ in range(10):
        opt.zero_grad()
        loss = ((tx_ @ tw + tb - ty) ** 2).sum()
        loss.backward()
        opt.step()

    # --- our side: param tree with leaf names driving the decay mask ---
    from svpc_tpu.train.optim import bert_adam
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = bert_adam(lr=1e-3, schedule="warmup_linear", warmup=0.2, t_total=50)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((jnp.asarray(x) @ p["dense"]["kernel"]
                        + p["dense"]["bias"] - jnp.asarray(y)) ** 2)

    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_ema_schedule_matches_reference():
    import jax.numpy as jnp
    from svpc_tpu.train.optim import ema_update

    decay = 0.9999
    shadow = {"w": jnp.ones((3,))}
    param = {"w": jnp.zeros((3,))}
    # reference: decay_t = min(decay, (1+step)/(10+step)) (optimization.py:197)
    ref_shadow = np.ones(3)
    for step in range(5):
        d = min(decay, (1 + step) / (10.0 + step))
        ref_shadow = (1 - d) * np.zeros(3) + d * ref_shadow
        shadow = ema_update(shadow, param, float(step), decay)
    np.testing.assert_allclose(np.asarray(shadow["w"]), ref_shadow, rtol=1e-6)


def test_decay_mask_excludes_bias_and_scale():
    import jax.numpy as jnp
    from svpc_tpu.train.optim import _decay_mask
    params = {
        "dense": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))},
        "ln": {"scale": jnp.zeros((2,)), "bias": jnp.zeros((2,))},
        "embedding": jnp.zeros((4, 2)),
    }
    mask = _decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ln"]["scale"] is False
    assert mask["ln"]["bias"] is False
    assert mask["embedding"] is True
