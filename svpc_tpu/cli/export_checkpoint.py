"""Export an svpc_tpu (orbax) checkpoint to a reference-format ``.chkpt``.

The written file passes the reference's strict ``load_state_dict``
(test.py:382-383) and decodes token-for-token identically
(tests/test_reference_checkpoint.py::test_export_chkpt_runs_under_reference)
— so a model trained here keeps working with the reference's test.py /
dump_memories.py / translator tooling.

  python -m svpc_tpu.cli.export_checkpoint --model_type vivt ... \
    --checkpoint results/run/checkpoint_best --out model.chkpt [--ema]
"""

from __future__ import annotations

import argparse
import logging
import os

import jax

from svpc_tpu.cli.common import add_common_args, config_from_args
from svpc_tpu.data.synthetic import synthetic_batch
from svpc_tpu.model.import_torch import export_reference_checkpoint

logger = logging.getLogger(__name__)


def main():
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (checkpoint_best/_last)")
    p.add_argument("--out", required=True, help="output .chkpt path")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA shadow params instead of the raw "
                        "params (the reference evaluates EMA weights)")
    args = p.parse_args()
    cfg = config_from_args(args)
    if not os.path.exists(args.checkpoint):
        raise SystemExit(f"checkpoint not found: {args.checkpoint}")

    sample = synthetic_batch(cfg, batch_size=1, seed=0)
    from svpc_tpu.train.loop import restore_train_state
    _, state = restore_train_state(cfg, sample, args.checkpoint)

    flax_params = jax.device_get(state.eval_params() if args.ema
                                 else state.params)
    export_reference_checkpoint(args.out, flax_params, cfg,
                                epoch=int(state.epoch))
    logger.info("reference-format checkpoint written to %s "
                "(epoch %d, %s params)", args.out, int(state.epoch),
                "EMA" if args.ema else "raw")


if __name__ == "__main__":
    main()
