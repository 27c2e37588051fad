"""Decode throughput on one chip (packed vs dense layouts).

Counterpart of the decode half of tools/bench_reference.py; same
clip-count accounting (real clips per step_mask).  ``--beam_size K``
switches to batched beam search (``--n_best N`` for ranked output) —
the serving-side production alternative to greedy.

Run:  python tools/bench_decode.py [--batch_size 8] [--iters 10]
      python tools/bench_decode.py --beam_size 3 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model_mode", default="full")
    p.add_argument("--dtype", default="float32",
                   help="parity path is float32; bfloat16 for speed")
    p.add_argument("--packed", type=int, default=1)
    p.add_argument("--beam_size", type=int, default=0,
                   help="> 1: batched beam search instead of greedy")
    p.add_argument("--n_best", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from svpc_tpu.config import Config, ModelConfig, TrainConfig
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.decode.greedy import greedy_decode
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.precision import precision_scope
    from svpc_tpu.runtime import init_runtime

    init_runtime()
    cfg = Config(model=ModelConfig(model_mode=args.model_mode,
                                   compute_dtype=args.dtype),
                 train=TrainConfig(batch_size=args.batch_size))

    batch_np = synthetic_batch(cfg, batch_size=args.batch_size, seed=0,
                               full_steps=True)
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "reference_baseline.json")
    baseline = json.load(open(base)) if os.path.exists(base) else None
    if baseline and baseline.get("step_counts"):
        from svpc_tpu.data.synthetic import apply_step_counts
        apply_step_counts(batch_np, baseline["step_counts"])
    total_clips = float(batch_np["step_mask"].sum())

    if args.packed:
        from svpc_tpu.data.packing import pack_batch
        batch_np = pack_batch(batch_np, cfg.model.max_t_len, clip_multiple=16)

    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    with precision_scope(cfg.model):
        abstract = jax.eval_shape(
            lambda: model.init(rngs, batch, deterministic=True))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
        if args.beam_size > 1:
            from svpc_tpu.decode.beam import beam_decode
            fn = jax.jit(lambda p, b: beam_decode(
                model, p, b, beam_size=args.beam_size,
                n_best=args.n_best))
        else:
            fn = jax.jit(lambda p, b: greedy_decode(model, p, b))

        def sync(out):  # block_until_ready is a no-op on axon
            leaf = out[0] if isinstance(out, tuple) else out
            leaf.reshape(-1)[0].item()

        out = fn(params, batch)
        sync(out)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, batch)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters

    cps = total_clips / dt
    vs = (cps / baseline["decode_clips_per_sec"]) if baseline else None
    print(json.dumps({
        "metric": "decode_clips_per_sec_per_chip",
        "value": round(cps, 2), "unit": "clips/sec",
        "packed": bool(args.packed), "dtype": args.dtype,
        "decoder": (f"beam{args.beam_size}_n{args.n_best}"
                    if args.beam_size > 1 else "greedy"),
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
