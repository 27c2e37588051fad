"""Measured closure for SURVEY §7's "fused Pallas memory-update kernel"
plan line (round-2 VERDICT item 7).

Isolates the visual simulator's cost at the flagship geometry on the real
chip, three ways:

  * the jitted EntityReasoner alone, forward and forward+grad (what an
    ideal fused kernel could at best eliminate);
  * the full train step per ablation mode — (reason_copy - copy) is the
    reasoner's marginal cost inside the real program where XLA can
    overlap it with neighbors, (full - reason_copy) the re-simulator's.

Run on a real TPU:  python tools/bench_reasoner.py
Writes the ceiling numbers DESIGN.md §6 cites.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("SVPC_BENCH_ITERS", "30"))
BATCH = int(os.environ.get("SVPC_BENCH_BATCH", "32"))


def _time(fn, *args):
    out = fn(*args)
    # sync by host transfer (block_until_ready is a no-op on axon)
    float(jax_leaf(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jax_leaf(out))
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def jax_leaf(tree):
    import jax
    leaves = jax.tree.leaves(tree)
    x = leaves[0]
    while getattr(x, "ndim", 0) > 0:
        x = x[(0,) * x.ndim]
        break
    return x.reshape(()) if hasattr(x, "reshape") else x


def main():
    import jax
    import jax.numpy as jnp

    from svpc_tpu.config import Config, ModelConfig, TrainConfig
    from svpc_tpu.model.reasoner import EntityReasoner
    from svpc_tpu.runtime import init_runtime

    init_runtime()
    dtype = os.environ.get("SVPC_BENCH_DTYPE", "bfloat16")
    mcfg = ModelConfig(model_mode="full", compute_dtype=dtype)
    B, S, E, H = BATCH, mcfg.max_n_sen, mcfg.max_entities, mcfg.hidden_size

    # --- the reasoner alone ---
    reasoner = EntityReasoner(mcfg)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    steps = jax.random.normal(jax.random.PRNGKey(0), (B, S, H), dt)
    ingr = jax.random.normal(jax.random.PRNGKey(1), (B, E, H), dt)
    emask = jnp.ones((B, E), jnp.float32)
    params = reasoner.init(jax.random.PRNGKey(2), steps, ingr, emask,
                           deterministic=True)

    fwd = jax.jit(lambda p, s, i, m: reasoner.apply(
        p, s, i, m, deterministic=True).ent_probs.sum())
    grad = jax.jit(jax.grad(lambda p, s, i, m: reasoner.apply(
        p, s, i, m, deterministic=True).ent_probs.sum()))
    t_fwd = _time(fwd, params, steps, ingr, emask)
    t_grad = _time(grad, params, steps, ingr, emask)

    # --- full train step per mode (marginal costs) ---
    from bench import _setup
    from svpc_tpu.precision import precision_scope
    from svpc_tpu.train.optim import make_optimizer, training_rng
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_train_step

    step_ms = {}
    for mode in ("copy", "reason_copy", "full"):
        cfg = Config(model=ModelConfig(model_mode=mode, compute_dtype=dtype),
                     train=TrainConfig(optimizer_dtype="bfloat16"))
        with precision_scope(cfg.model):
            c, model, batch, p, n_clips = _setup(cfg, BATCH, True, None)
            tx = make_optimizer(c.train, steps_per_epoch=100)
            state = TrainState.create(p, tx, use_ema=True,
                                      ema_dtype="bfloat16")
            ts = jax.jit(make_train_step(model, tx, c), donate_argnums=0)
            rng = training_rng(3, c.train.rng_impl)
            state, m = ts(state, batch, rng)
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, m = ts(state, batch, rng)
            float(m["loss"])
            step_ms[mode] = (time.perf_counter() - t0) / ITERS * 1e3

    out = {
        "geometry": dict(B=B, S=S, E=E, H=H, dtype=dtype),
        "reasoner_fwd_ms": round(t_fwd, 3),
        "reasoner_fwd_grad_ms": round(t_grad, 3),
        "train_step_ms": {k: round(v, 3) for k, v in step_ms.items()},
        "reasoner_marginal_ms": round(step_ms["reason_copy"]
                                      - step_ms["copy"], 3),
        "resim_marginal_ms": round(step_ms["full"]
                                   - step_ms["reason_copy"], 3),
        "reasoner_ceiling_pct_of_full_step": round(
            100 * max(step_ms["reason_copy"] - step_ms["copy"], 0.0)
            / step_ms["full"], 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
