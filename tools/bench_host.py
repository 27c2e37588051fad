"""Host-pipeline benchmark: packed-batch build throughput, no device.

Measures CaptionDataset -> packing_builder (lazy pipeline: native mmap
fill + cross-epoch example cache) on a real feature store. Run twice per
label to separate cold (disk-bound) from warm (memcpy-bound) passes.

    python tools/bench_host.py --video_feature_dir /tmp/svpc_scale/features \
        --duration_file /tmp/svpc_scale/dur_train.csv [--batch_size 32]

Numbers of record (2026-08-16, 1-core host, full YC2 train split):
~3500 clips/s warm f32, ~3100 clips/s warm f16 at half the footprint —
single-core memcpy bandwidth; see BASELINE.md / docs/DESIGN.md §6.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir",
                   default="/root/reference/densevid_eval/yc2_data")
    p.add_argument("--video_feature_dir", required=True)
    p.add_argument("--duration_file", required=True)
    p.add_argument("--word2idx_path",
                   default="/root/reference/cache/yc2_word2idx.json")
    p.add_argument("--verb2idx_path",
                   default="/root/reference/cache/bosselut_verb_vocab.json")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_batches", type=int, default=20)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--eager", action="store_true",
                   help="benchmark the eager (materialized-example) path")
    args = p.parse_args()

    from svpc_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.train.loop import packing_builder

    cfg = Config(
        model=ModelConfig(model_mode="full", compute_dtype="bfloat16"),
        data=DataConfig(
            data_dir=args.data_dir,
            video_feature_dir=args.video_feature_dir,
            duration_file=args.duration_file,
            word2idx_path=args.word2idx_path,
            verb2idx_path=args.verb2idx_path,
            num_workers=args.num_workers),
        train=TrainConfig(batch_size=args.batch_size))
    ds = CaptionDataset(cfg, "train", lazy_features=not args.eager)
    print(f"videos: {len(ds)}, lazy={not args.eager}, "
          f"fill_workers={args.num_workers}")
    builder = packing_builder(cfg, None)
    for rep in range(args.passes):
        t0 = time.time()
        nb = nc = 0
        for batch, metas in ds.batches(args.batch_size, shuffle=True,
                                       seed=5, builder=builder):
            nb += 1
            nc += int(sum(m["n_steps"] for m in metas))
            if nb == args.n_batches:
                break
        dt = time.time() - t0
        if not nb:
            raise SystemExit("no batches produced — do the feature files "
                             "match the split's video names?")
        print(f"pass {rep}: {nc / dt:.0f} clips/s host, "
              f"{dt / nb * 1e3:.0f} ms/batch")


if __name__ == "__main__":
    main()
