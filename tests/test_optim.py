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


def test_global_clip_chain_matches_reference():
    """The FULL chain — global clip_grad_norm_(1) then BertAdam — must
    track the reference trajectory on steps where the clip fires
    (train.py:141-142).  torch scales by max_norm/(total_norm + 1e-6)
    and computes total_norm as the norm of per-parameter norms;
    optax.clip_by_global_norm does neither, hence
    clip_by_global_norm_torch."""
    import torch
    import jax
    import jax.numpy as jnp
    import optax
    from tools.reference_harness import install_patches
    install_patches()
    import sys
    sys.path.insert(0, rb.REFERENCE_ROOT)
    from src.rtransformer.optimization import BertAdam

    rng = np.random.RandomState(3)
    w0 = rng.randn(6, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    x = (rng.randn(16, 6) * 10).astype(np.float32)   # big grads -> clip fires
    y = rng.randn(16, 4).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    groups = [{"params": [tw], "weight_decay": 0.01},
              {"params": [tb], "weight_decay": 0.0}]
    opt = BertAdam(groups, lr=1e-3, warmup=0.2, t_total=50,
                   schedule="warmup_linear")
    tx_, ty = torch.from_numpy(x), torch.from_numpy(y)
    clipped_any = False
    for _ in range(10):
        opt.zero_grad()
        loss = ((tx_ @ tw + tb - ty) ** 2).sum()
        loss.backward()
        total = torch.nn.utils.clip_grad_norm_([tw, tb], 1.0)
        clipped_any = clipped_any or float(total) > 1.0
        opt.step()
    assert clipped_any, "fixture too tame: the global clip never fired"

    from svpc_tpu.train.optim import bert_adam, clip_by_global_norm_torch
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = optax.chain(
        clip_by_global_norm_torch(1.0),
        bert_adam(lr=1e-3, schedule="warmup_linear", warmup=0.2, t_total=50))
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((jnp.asarray(x) @ p["dense"]["kernel"]
                        + p["dense"]["bias"] - jnp.asarray(y)) ** 2)

    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]),
                               tb.detach().numpy(), rtol=1e-6, atol=1e-7)


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


def test_freeze_glove_zeroes_table_updates():
    """freeze_glove must zero updates on the GloVe-initialized tables only
    (reference from_pretrained(freeze=True), train.py:694-714)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.train.optim import make_optimizer

    # lr_warmup 0: warmup_linear's step-0 multiplier is 0.0, which would
    # make every update zero and the test vacuous
    cfg = tiny_test_config("full").replace_train(freeze_glove=True,
                                                 lr_warmup_proportion=0.0)
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, seed=6).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    def loss(p):
        return model.apply(p, batch, deterministic=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)}).total_loss

    grads = jax.grad(lambda p: loss({"params": p}))(params["params"])
    tx = make_optimizer(cfg.train, steps_per_epoch=10)
    state = tx.init(params["params"])
    updates, _ = tx.update(grads, state, params["params"])

    frozen = (updates["text_embeddings"]["word_embeddings"]["embedding"],
              updates["ingredient_embeddings"]["word_embeddings"]["embedding"],
              updates["reasoner"]["action_embeddings"],
              updates["recipe_reasoner"]["action_embeddings"])
    for u in frozen:
        assert float(jnp.abs(u).max()) == 0.0
    live = updates["encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"]
    assert float(jnp.abs(live).max()) > 0.0


def test_bf16_optimizer_state_tracks_f32():
    """optimizer_dtype="bfloat16" stores moments rounded but must track
    the f32 trajectory closely on a quadratic (math stays f32), and the
    carried m/v leaves really are bf16 (round-1 VERDICT item 8)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.train.optim import BertAdamState, bert_adam

    rng = np.random.RandomState(1)
    w0 = rng.randn(8, 8).astype(np.float32)
    x = rng.randn(32, 8).astype(np.float32)
    y = rng.randn(32, 8).astype(np.float32)

    def loss_fn(p):
        return jnp.sum((jnp.asarray(x) @ p["dense"]["kernel"]
                        - jnp.asarray(y)) ** 2)

    def run(state_dtype):
        params = {"dense": {"kernel": jnp.asarray(w0)}}
        tx = bert_adam(lr=1e-3, schedule="warmup_linear", warmup=0.2,
                       t_total=50, state_dtype=state_dtype)
        state = tx.init(params)
        for _ in range(10):
            grads = jax.grad(loss_fn)(params)
            updates, state = tx.update(grads, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, state

    p32, _ = run(None)
    p16, s16 = run("bfloat16")
    inner = s16
    while not isinstance(inner, BertAdamState):
        inner = [s for s in inner if hasattr(s, "m")][0]
    for leaf in jax.tree.leaves(inner.m) + jax.tree.leaves(inner.v):
        assert leaf.dtype == jnp.bfloat16
    # params themselves stay f32 and stay close to the f32 trajectory
    a, b = np.asarray(p16["dense"]["kernel"]), np.asarray(p32["dense"]["kernel"])
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-4)


def test_bf16_ema_shadow_and_eval_params():
    """bf16 EMA shadow (TrainConfig.optimizer_dtype): stored rounded,
    updated through ema_update without dtype drift, widened to f32 by
    eval_params, and still protected by the nonfinite-update guard."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_apply_step

    cfg = tiny_test_config("video")
    cfg = cfg.replace_train(optimizer_dtype="bfloat16")
    params = {"params": {"dense": {
        "kernel": jnp.asarray(np.random.RandomState(0)
                              .randn(4, 4).astype(np.float32))}}}
    tx = make_optimizer(cfg.train, steps_per_epoch=10)
    state = TrainState.create(params, tx, use_ema=True,
                              ema_dtype=cfg.train.optimizer_dtype)
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(state.ema_shadow))
    # eval params come back widened to the parameter dtype
    ev = state.eval_params()
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(ev))

    apply_step = make_apply_step(tx, cfg)
    grads = jax.tree.map(jnp.ones_like, params["params"])
    state2, m = apply_step(state, grads)
    assert int(m["nonfinite_skipped"]) == 0
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(state2.ema_shadow))
    # nonfinite guard: nan grads leave every (bf16) slice untouched
    nan_grads = jax.tree.map(lambda g: jnp.full_like(g, jnp.nan), grads)
    state3, m3 = apply_step(state2, nan_grads)
    assert int(m3["nonfinite_skipped"]) == 1
    for a, b in zip(jax.tree.leaves(state2.ema_shadow),
                    jax.tree.leaves(state3.ema_shadow)):
        np.testing.assert_array_equal(np.asarray(a).view(np.uint16),
                                      np.asarray(b).view(np.uint16))
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(state3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_decay_mask_matches_reference_grouping():
    """Weight decay must select exactly the reference's parameter groups
    (train.py:339-343: no decay iff the TORCH name contains 'bias' or
    'LayerNorm.weight').  The rule has quirks a flax leaf name can't see:
    word_fc Sequential LN weights ('word_fc.0.weight') and decoder
    norm1/norm2 weights ARE decayed, LSTM biases ('bias_ih_l0') are NOT."""
    import numpy as np
    from svpc_tpu.model.import_torch import build_mapping
    from svpc_tpu.train.optim import reference_decay_mask_fn

    mapping = build_mapping("full", 2)
    tree = {}
    for f_key in mapping:
        d = tree
        parts = f_key.split("/")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.zeros(())
    params = {"params": tree}
    mask = reference_decay_mask_fn("full", 2)(params)["params"]

    def get(path):
        d = mask
        for p in path.split("/"):
            d = d[p]
        return d

    # every leaf follows the torch-name rule
    for f_key, (t_key, _) in mapping.items():
        want = "bias" not in t_key and "LayerNorm.weight" not in t_key
        assert get(f_key) == want, (f_key, t_key)

    # the quirks the flax-name heuristic gets wrong:
    assert get("text_embeddings/word_fc/ln_in/ln/scale") is True
    assert get("decoder/layer_0/norm1/ln/scale") is True
    assert get("encoder/layer_0/output/layer_norm/ln/scale") is False
    assert get("recipe_encoder/b_ih_fwd") is False
    assert get("decoder_classifier/transform/layer_norm/ln/scale") is False


def test_warmup_proportion_validated():
    import pytest
    from svpc_tpu.train.optim import lr_schedule_fn

    with pytest.raises(ValueError, match="warmup"):
        lr_schedule_fn("warmup_linear", 1.0, 100)
    lr_schedule_fn("warmup_linear", 0.999, 100)  # in-range is fine
