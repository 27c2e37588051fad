"""Benchmark: svpc_tpu training throughput on one chip vs the PyTorch
reference on CPU (the reference publishes no numbers and has no GPU here;
BASELINE.md).

Prints ONE JSON line:
  {"metric": "train_clips_per_sec_per_chip", "value": N, "unit":
   "clips/sec", "vs_baseline": ratio}

vs_baseline compares against tools/reference_baseline.json (measured with
tools/bench_reference.py on this machine's CPU, same batch composition).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from svpc_tpu.config import Config, ModelConfig, TrainConfig
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.precision import precision_scope
    from svpc_tpu.runtime import init_runtime
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_train_step

    init_runtime()

    batch_size = int(os.environ.get("SVPC_BENCH_BATCH", "8"))
    iters = int(os.environ.get("SVPC_BENCH_ITERS", "20"))
    compute_dtype = os.environ.get("SVPC_BENCH_DTYPE", "bfloat16")
    packed = os.environ.get("SVPC_BENCH_PACKED", "1") == "1"

    # flagship vivt paper config
    cfg = Config(model=ModelConfig(model_mode="full",
                                   compute_dtype=compute_dtype),
                 train=TrainConfig(batch_size=batch_size))

    # reproduce the baseline batch's clip distribution: the reference
    # baseline measured the first 8 YC2 train videos (tools/
    # reference_baseline.json: total_clips real steps); our fixed-shape
    # batch always computes max_n_sen steps, so clips/sec here counts the
    # same *real* clips for a fair comparison.
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tools", "reference_baseline.json")
    baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)

    # full-length clips (98 valid feature rows, like the reference's padded
    # 100-token spans) so the packed path gets no video-span advantage here
    # — only the step-packing is credited, mirroring the reference workload
    batch_np = synthetic_batch(cfg, batch_size=batch_size, seed=0,
                               full_steps=True)
    if baseline and baseline.get("step_counts"):
        from svpc_tpu.data.synthetic import apply_step_counts
        apply_step_counts(batch_np, baseline["step_counts"])
    total_clips = float(batch_np["step_mask"].sum())

    if packed:
        from svpc_tpu.data.packing import pack_batch
        batch_np = pack_batch(batch_np, cfg.model.max_t_len,
                              clip_multiple=16)

    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}

    with precision_scope(cfg.model):
        # zero params from an abstract template: skips the init compile
        # (values don't affect throughput)
        abstract = jax.eval_shape(
            lambda: model.init(rngs, batch, deterministic=True))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
        tx = make_optimizer(cfg.train, steps_per_epoch=100)
        state = TrainState.create(params, tx, use_ema=True)
        train_step = jax.jit(make_train_step(model, tx, cfg),
                             donate_argnums=0)
        from svpc_tpu.train.optim import training_rng
        rng = training_rng(3, cfg.train.rng_impl)

        # warmup / compile.  NOTE: block_until_ready is a no-op on the
        # experimental axon platform — force a host transfer to sync.
        state, m = train_step(state, batch, rng)
        float(m["loss"])

        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_step(state, batch, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters

    clips_per_sec = total_clips / dt
    vs_baseline = (clips_per_sec / baseline["train_clips_per_sec"]
                   if baseline else None)

    print(json.dumps({
        "metric": "train_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
