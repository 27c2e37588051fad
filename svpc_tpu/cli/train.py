"""Training CLI.

Usage (mirrors scripts/train.sh of the reference):
  python -m svpc_tpu.cli.train --model_type vivt \
    --video_feature_dir /path/features --duration_file /path/dur.csv \
    --workdir results/run1
"""

from __future__ import annotations

import argparse
import logging

from svpc_tpu.cli.common import add_common_args, config_from_args
from svpc_tpu.train.loop import train


def main():
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--workdir", required=True)
    p.add_argument("--max_steps_per_epoch", type=int, default=None)
    p.add_argument("--no_language_eval", action="store_true")
    p.add_argument("--no_tensorboard", action="store_true")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="trace this many steady-state steps with jax.profiler")
    p.add_argument("--debug_nans", action="store_true",
                   help="per-op NaN checks (reference anomaly-detection analog)")
    p.add_argument("--resume_from", default=None,
                   help="checkpoint dir to resume training from "
                        "(params+optimizer+EMA+epoch; a mid-epoch "
                        "checkpoint resumes inside its epoch exactly)")
    p.add_argument("--checkpoint_every_steps", type=int, default=0,
                   help="also save checkpoint_last every N optimizer "
                        "steps (mid-epoch crash recovery; 0 = per epoch)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host slice: jax.distributed.initialize() "
                        "from the TPU environment; every host builds the "
                        "same deterministic global batch and transfers "
                        "only the shards its devices own "
                        "(parallel/mesh.py::assemble_global_batch)")
    p.add_argument("--multihost_sharded_data", action="store_true",
                   help="with --multihost: each host also BUILDS only "
                        "the packed-batch blocks its devices own "
                        "(per-host data loading — host work / "
                        "process_count; identical device bytes; "
                        "requires the packed layout)")
    args = p.parse_args()
    if args.multihost:
        import jax
        jax.distributed.initialize()
    cfg = config_from_args(args)
    if args.debug:
        args.max_steps_per_epoch = 1
    train(cfg, args.workdir, max_steps_per_epoch=args.max_steps_per_epoch,
          eval_language=not args.no_language_eval,
          tensorboard=not args.no_tensorboard,
          profile_steps=args.profile_steps, debug_nans=args.debug_nans,
          resume_from=args.resume_from)


if __name__ == "__main__":
    main()
