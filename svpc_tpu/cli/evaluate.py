"""Offline evaluation CLI (reference: src/test.py + scripts/eval_caption.sh).

Decodes a split greedily from a checkpoint, writes the submission JSON and
the merged metric bundle, optionally ingredient F1
(scripts/eval_ingredient_f1.sh equivalent via --ingredient_f1).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from svpc_tpu.cli.common import (add_common_args, config_from_args, reject_pp,
                                 load_eval_model)
from svpc_tpu.data.anet import para_reference_files
from svpc_tpu.data.pipeline import CaptionDataset
from svpc_tpu.evaluation.ingredient_f1 import (
    build_ingredient_dictionary, ingredient_f1)
from svpc_tpu.evaluation.para_eval import evaluate_submission
from svpc_tpu.train.loop import run_greedy_eval

logger = logging.getLogger(__name__)


def main():
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ingredient_f1", action="store_true")
    p.add_argument("--use_beam", action="store_true",
                   help="beam search (a real implementation — the "
                        "reference's flag silently falls back to greedy)")
    p.add_argument("--beam_size", type=int, default=2)
    p.add_argument("--n_best", type=int, default=1,
                   help="with --use_beam: keep the top-n ranked hypotheses "
                        "per step in the submission (reference "
                        "train.py:546-548 surface)")
    p.add_argument("--torch_checkpoint", action="store_true",
                   help="--checkpoint is a reference PyTorch .chkpt file; "
                        "weights are imported directly (token-for-token "
                        "decode parity)")
    args = p.parse_args()
    if args.n_best > 1 and not args.use_beam:
        p.error("--n_best > 1 requires --use_beam (greedy decode yields "
                "a single hypothesis)")
    if args.use_beam and args.beam_size < 2:
        p.error("--use_beam requires --beam_size >= 2 (beam_size 1 IS "
                "greedy decode — drop --use_beam)")
    if args.use_beam and args.n_best > args.beam_size:
        p.error(f"--n_best {args.n_best} cannot exceed "
                f"--beam_size {args.beam_size} (a beam of K carries only "
                "K ranked hypotheses)")
    reject_pp(args, p)
    cfg = config_from_args(args)
    if not os.path.exists(args.checkpoint):
        raise SystemExit(f"checkpoint not found: {args.checkpoint}")
    os.makedirs(args.output_dir, exist_ok=True)

    cfg, model, eval_params, ds = load_eval_model(
        cfg, args, lambda c: CaptionDataset(c, args.split,
                                            lazy_features=True))

    # multi-chip serving: batch sharded over dp, params sharded per the
    # tp rules (same mesh the train loop's per-epoch eval uses)
    mesh = None
    if args.dp_size * args.tp_size > 1:
        from svpc_tpu.parallel.mesh import make_mesh, shard_params
        mesh = make_mesh(dp_size=args.dp_size, tp_size=args.tp_size)
        eval_params = dict(eval_params)
        eval_params["params"] = shard_params(mesh, eval_params["params"])

    if args.use_beam and args.n_best > 1:
        from svpc_tpu.train.loop import run_nbest_eval
        submission = run_nbest_eval(model, eval_params, ds, cfg,
                                    beam_size=args.beam_size,
                                    n_best=args.n_best, mesh=mesh)
        decode_name = f"beam{args.beam_size}_n{args.n_best}"
    else:
        submission = run_greedy_eval(
            model, eval_params, ds, cfg, mesh=mesh,
            beam_size=args.beam_size if args.use_beam else 0)
        decode_name = f"beam{args.beam_size}" if args.use_beam else "greedy"
    sub_path = os.path.join(args.output_dir,
                            f"{decode_name}_pred_{args.split}.json")
    with open(sub_path, "w") as f:
        json.dump(submission, f, indent=2)
    logger.info("submission written to %s", sub_path)

    metrics = {}
    ref_paths = [os.path.join(cfg.data.data_dir, f)
                 for f in para_reference_files(cfg.data.dset_name,
                                               args.split)]
    ref_paths = [p for p in ref_paths if os.path.exists(p)]
    if ref_paths:
        metrics = evaluate_submission(submission, ref_paths)

    if args.ingredient_f1:
        with open(os.path.join(
                cfg.data.data_dir,
                f"bosselut_split_yc2_{args.split}_anet_format.json"
                if args.split != "train"
                else "bosselut_yc2_train_anet_format.json")) as f:
            gt = json.load(f)
        all_dict = build_ingredient_dictionary(cfg.data.data_dir)
        gt_recipes, gen_recipes = {}, {}
        for rid, ann in gt.items():
            if rid not in submission["results"]:
                continue
            gt_recipes[rid] = dict(ingredients=ann["ingredients"],
                                   sentences=ann["sentences"])
            gen_recipes[rid] = dict(
                ingredients=ann["ingredients"],
                sentences=[e["sentence"]
                           for e in submission["results"][rid]])
        metrics["ingredient_f1"] = ingredient_f1(
            gt_recipes, gen_recipes, all_dict)

    metrics_path = os.path.join(args.output_dir,
                                f"metrics_{args.split}.json")
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    logger.info("metrics: %s", json.dumps(
        {k: v for k, v in metrics.items()
         if isinstance(v, (int, float))}, indent=2))


if __name__ == "__main__":
    main()
