"""Dump entity/action memories for analysis
(reference: src/dump_memories.py + scripts/dump_embeddings.sh).

Runs the model with memory capture over a split and pickles
``{model_type}_step_embedding_dict.pkl`` with per-recipe entity/action
probabilities, entity vectors, and (full mode) the re-simulator's outputs
— same payload as the reference (dump_memories.py:33-75, model.py:1120-1127).
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from svpc_tpu.cli.common import add_common_args, config_from_args, reject_pp
from svpc_tpu.config import MODE_TO_MODEL_TYPE
from svpc_tpu.data.pipeline import CaptionDataset
from svpc_tpu.precision import precision_scope

logger = logging.getLogger(__name__)


def dump_memories(model, params, dataset, cfg, max_batches=None):
    from svpc_tpu.runtime import transient_retry

    @jax.jit
    def forward(p, b):
        return model.apply(p, b, deterministic=True, return_memory=True,
                           rngs={"gumbel": jax.random.PRNGKey(0)})

    # per-shape recompiles ride the tunnel RPC (svpc_tpu/runtime.py)
    forward = transient_retry(forward, what="memory forward")

    dump = {}
    with precision_scope(cfg.model):
        for i, (batch, metas) in enumerate(
                dataset.batches(cfg.train.val_batch_size)):
            out = forward(params, batch)
            mem = jax.device_get(out.memory)
            for b, meta in enumerate(metas):
                s = meta["n_steps"]
                e = meta["n_entities"]
                entry = {
                    "entity_probs": mem["entity_probs"][b, :s, :e],
                    "action_probs": mem["action_probs"][b, :s],
                    "entity_vectors": [
                        mem["ingr_vectors"][b, :e],
                        mem["step_entity_vectors"][b, :s, :e],
                    ],
                }
                if "re_pred_entity_probs" in mem:
                    entry.update(
                        re_pred_entity_probs=mem["re_pred_entity_probs"][b, :s, :e],
                        re_pred_action_probs=mem["re_pred_action_probs"][b, :s],
                        re_entity_vectors=mem["re_entity_vectors"][b, :s, :e],
                    )
                dump[meta["name"]] = entry
            if max_batches and i + 1 >= max_batches:
                break
    return dump


def main():
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--torch_checkpoint", action="store_true",
                   help="--checkpoint is a reference PyTorch .chkpt file; "
                        "weights are imported directly")
    args = p.parse_args()
    reject_pp(args, p)
    cfg = config_from_args(args)
    if cfg.model.model_mode not in ("full", "reason_copy"):
        raise SystemExit("memory dump requires model_type vivt or viv")
    if not os.path.exists(args.checkpoint):
        raise SystemExit(f"checkpoint not found: {args.checkpoint}")
    os.makedirs(args.output_dir, exist_ok=True)

    from svpc_tpu.cli.common import load_eval_model
    cfg, model, eval_params, ds = load_eval_model(
        cfg, args, lambda c: CaptionDataset(c, args.split,
                                            lazy_features=True))

    dump = dump_memories(model, eval_params, ds, cfg)
    model_type = MODE_TO_MODEL_TYPE[cfg.model.model_mode]
    out_path = os.path.join(args.output_dir,
                            f"{model_type}_step_embedding_dict.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(dump, f)
    logger.info("wrote %d recipes to %s", len(dump), out_path)


if __name__ == "__main__":
    main()
