"""Serving-path benchmark: request latency + throughput of the caption
daemon's core (CaptionService + DynamicBatcher) on one chip.

Measures what a deployment cares about and BASELINE.md records:
  * single-request latency (sequential submits, no batching credit),
  * throughput under concurrency (C threads of back-to-back requests
    coalescing into fixed-shape device batches).

Workload: paper-config videos with synthetic features ON DISK (the
serving path reads + packs features per request, so host IO is included
— unlike bench.py's resident device batches).  Random-init params: decode
throughput does not depend on parameter values.

Run:  python tools/bench_serving.py [--batch_videos 8] [--requests 64]
      [--concurrency 1,8,32] [--dtype bfloat16] [--videos 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def build_service(args, feat_dir, dur_file):
    import jax
    import jax.numpy as jnp

    from svpc_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.serving import CaptionService, dummy_example

    yc2 = os.path.join(REFERENCE, "densevid_eval/yc2_data")
    cache = os.path.join(REFERENCE, "cache")
    w2i = json.load(open(os.path.join(cache, "yc2_word2idx.json")))
    v2i = json.load(open(os.path.join(cache, "bosselut_verb_vocab.json")))
    cfg = Config(
        model=ModelConfig(vocab_size=len(w2i), action_vocab_size=len(v2i),
                          model_mode=args.model_mode,
                          compute_dtype=args.dtype),
        data=DataConfig(data_dir=yc2, video_feature_dir=feat_dir,
                        duration_file=dur_file,
                        word2idx_path=os.path.join(cache,
                                                   "yc2_word2idx.json"),
                        verb2idx_path=os.path.join(
                            cache, "bosselut_verb_vocab.json")),
        train=TrainConfig())

    model = SVPCModel(cfg.model)
    sample = batch_examples([dummy_example(cfg, cfg.model.max_n_sen,
                                           cfg.model.action_vocab_size)])
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    jbatch = {k: jnp.asarray(v) for k, v in sample.items()}
    abstract = jax.eval_shape(
        lambda: model.init(rngs, jbatch, deterministic=True))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
    buckets = ([int(b) for b in args.clip_buckets.split(",")]
               if args.clip_buckets else None)
    t0 = time.perf_counter()
    service = CaptionService(cfg, model, params,
                             batch_videos=args.batch_videos,
                             clip_buckets=buckets, warmup=True)
    return cfg, service, time.perf_counter() - t0


def make_specs(args, feat_dir, dur_file):
    """Synthetic paper-scale features for the first N val videos (real
    annotations drive the clip structure)."""
    from tools.reference_harness import make_synthetic_features
    ann_path = os.path.join(
        REFERENCE, "densevid_eval/yc2_data",
        "bosselut_split_yc2_val_anet_format.json")
    anns = json.load(open(ann_path))
    names = list(anns)[:args.videos]
    make_synthetic_features(names, feat_dir, dur_file, anns, seed=0)
    specs = {}
    for n in names:
        specs[n] = {
            "timestamps": anns[n]["timestamps"],
            "ingredients": [w for w in anns[n].get("ingredients", [])],
        }
    return specs


def run_concurrency(service, specs, concurrency, total_requests,
                    max_wait_ms):
    from svpc_tpu.serving import DynamicBatcher
    batcher = DynamicBatcher(service, max_wait_ms=max_wait_ms)
    names = list(specs)
    entries = [service.make_entry(n, specs[n]) for n in names]
    errors = []
    counter = {"i": 0}
    lock = threading.Lock()

    def worker():
        while not errors:  # stop all workers on the first failure
            with lock:
                i = counter["i"]
                if i >= total_requests:
                    return
                counter["i"] = i + 1
            try:
                batcher.submit(entries[i % len(entries)], timeout=300.0)
            except Exception as e:
                errors.append(e)
                return

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    snap = batcher.stats.snapshot()
    batcher.close()
    if errors:
        raise errors[0]
    clips_served = snap["clips"]
    return {
        "concurrency": concurrency,
        "requests": total_requests,
        "wall_s": round(dt, 3),
        "requests_per_sec": round(total_requests / dt, 2),
        "clips_per_sec": round(clips_served / dt, 2),
        "mean_batch_videos": snap["mean_batch_videos"],
        "latency_ms": snap["latency_ms"],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_videos", type=int, default=8)
    p.add_argument("--videos", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--concurrency", default="1,8,32")
    p.add_argument("--max_wait_ms", type=float, default=10.0)
    p.add_argument("--clip_buckets", default="",
                   help="comma-separated smaller packed budgets "
                        "(cli.serve --clip_buckets)")
    p.add_argument("--model_mode", default="full")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--workdir", default="",
                   help="feature spool dir (default: a TemporaryDirectory)")
    args = p.parse_args()

    from svpc_tpu.runtime import init_runtime
    init_runtime()

    ctx = (tempfile.TemporaryDirectory() if not args.workdir else None)
    root = args.workdir or ctx.name
    feat_dir = os.path.join(root, "features")
    dur_file = os.path.join(root, "durations.csv")
    specs = make_specs(args, feat_dir, dur_file)
    cfg, service, startup_s = build_service(args, feat_dir, dur_file)

    report = {
        "config": {"batch_videos": args.batch_videos,
                   "model_mode": args.model_mode, "dtype": args.dtype,
                   "videos": len(specs), "max_wait_ms": args.max_wait_ms,
                   "clip_buckets": service._buckets},
        "startup_s": round(startup_s, 1),
        "runs": [],
    }
    for c in [int(x) for x in args.concurrency.split(",")]:
        r = run_concurrency(service, specs, c, args.requests,
                            args.max_wait_ms)
        report["runs"].append(r)
        print(json.dumps(r))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
