"""Caption NEW videos from a checkpoint — no ground-truth annotations.

The reference has no such entry point: its dataset requires GT sentences
for every clip (recursive_caption_dataset.py:171-340), so it can only
decode the annotated splits.  Here the user supplies a spec JSON

    {"<video_id>": {"timestamps": [[start_s, end_s], ...],
                    "ingredients": ["olive oil", "chicken breast", ...]},
     ...}

plus the feature files ``<video_id>_resnet.npy`` / ``<video_id>_bn.npy``
and the duration CSV row for each video, and gets the generated sentence
per clip.

    python -m svpc_tpu.cli.caption --model_type vivt ... \
        --checkpoint run/checkpoint_best --input_json videos.json \
        --output captions.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from svpc_tpu.cli.common import (add_common_args, config_from_args, reject_pp,
                                 load_eval_model)
from svpc_tpu.data.pipeline import CaptionDataset, inference_entries
from svpc_tpu.train.loop import run_greedy_eval

logger = logging.getLogger(__name__)


def main(argv=None):
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_json", required=True,
                   help="spec: {vid: {timestamps, ingredients}}")
    p.add_argument("--output", required=True, help="output captions JSON")
    p.add_argument("--use_beam", action="store_true")
    p.add_argument("--beam_size", type=int, default=2)
    p.add_argument("--torch_checkpoint", action="store_true",
                   help="--checkpoint is a reference PyTorch .chkpt file")
    args = p.parse_args(argv)
    reject_pp(args, p)
    cfg = config_from_args(args)
    if not os.path.exists(args.checkpoint):
        raise SystemExit(f"checkpoint not found: {args.checkpoint}")
    with open(args.input_json) as f:
        spec = json.load(f)
    if not spec:
        raise SystemExit(f"{args.input_json} is empty — expected "
                         "{video_id: {timestamps, ingredients}}")
    entries = inference_entries(spec, cfg.model.max_n_sen)

    def make_ds(c):
        ds = CaptionDataset(c, "infer", entries=entries, lazy_features=True)
        if ds.missing:
            raise SystemExit(
                f"missing feature files for: {', '.join(ds.missing)} "
                f"(need <vid>_resnet.npy + <vid>_bn.npy under "
                f"{c.data.video_feature_dir})")
        # a video with feature files but no duration-CSV row would
        # otherwise die with a bare KeyError inside make_example
        no_dur = [e["name"] for e in ds.data
                  if ds.video_name(e["name"]) not in ds.frame_to_second]
        if no_dur:
            raise SystemExit(
                f"no duration row for: {', '.join(no_dur)} in "
                f"{c.data.duration_file}")
        return ds

    cfg, model, eval_params, ds = load_eval_model(cfg, args, make_ds)

    submission = run_greedy_eval(
        model, eval_params, ds, cfg,
        beam_size=args.beam_size if args.use_beam else 0)
    # trim the submission to the user-facing payload (no gt_sentence)
    out = {vid: [{"timestamp": e["timestamp"], "sentence": e["sentence"]}
                 for e in clips]
           for vid, clips in submission["results"].items()}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    logger.info("captions for %d video(s) written to %s", len(out),
                args.output)


if __name__ == "__main__":
    main()
