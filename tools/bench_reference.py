"""Measure the PyTorch reference's training/decoding throughput on CPU.

Establishes the BASELINE numbers (BASELINE.md: the repo publishes none, so
they must be measured).  Uses the same YC2 annotations + synthetic
features as our benchmark so clips/sec is apples-to-apples.

Run:  python tools/bench_reference.py --batch_size 8 --iters 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--model_mode", default="full")
    p.add_argument("--feat_dir", default="/tmp/svpc_e2e/features/training")
    p.add_argument("--dur_file", default="/tmp/svpc_e2e/dur_all.csv")
    p.add_argument("--out", default="tools/reference_baseline.json")
    args = p.parse_args()

    from tools.reference_harness import (
        build_reference_model, install_patches, make_reference_dataset)
    install_patches()
    import torch
    torch.set_num_threads(os.cpu_count())

    model, cfg = build_reference_model(args.model_mode, load_glove=True)
    ds = make_reference_dataset(args.feat_dir, args.dur_file, split="train",
                                max_n_sen=12, max_t_len=22, max_v_len=100)
    print(f"reference dataset: {len(ds)} videos")

    from src.rtransformer.recursive_caption_dataset import caption_collate
    from src.rtransformer.optimization import BertAdam

    n = min(args.batch_size, len(ds))
    raw = caption_collate([ds[i] for i in range(n)])
    step_batches, step_sizes, metas, ingr, aligns, actions = raw
    total_clips = sum(step_sizes)

    inputs = dict(
        input_ids_list=[torch.as_tensor(b["input_ids"]) for b in step_batches],
        video_features_list=[b["video_feature"].float() for b in step_batches],
        input_masks_list=[b["input_mask"].float() for b in step_batches],
        token_type_ids_list=[torch.as_tensor(b["token_type_ids"])
                             for b in step_batches],
        input_labels_list=[torch.as_tensor(b["input_labels"])
                           for b in step_batches],
        ingr_input_ids=torch.LongTensor([e["ingr_ids"] for e in ingr]),
        ingr_masks=torch.LongTensor([e["ingr_mask"] for e in ingr]),
        ingr_sep_masks=torch.LongTensor([e["ingr_sep_mask"] for e in ingr]),
        batch_step_num=step_sizes,
        ingr_id_dict=[e["ingr_id_dict"] for e in ingr],
        extra_zeros=[len(e["oov_word_dict"]) for e in ingr],
        alignments=[a for a in aligns],
        actions=[a for a in actions],
    )

    model.train()
    param_optimizer = list(model.named_parameters())
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
    groups = [
        {"params": [pp for nn_, pp in param_optimizer
                    if not any(nd in nn_ for nd in no_decay)],
         "weight_decay": 0.01},
        {"params": [pp for nn_, pp in param_optimizer
                    if any(nd in nn_ for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    optimizer = BertAdam(groups, lr=1e-4, warmup=0.1, t_total=1000,
                         schedule="warmup_linear")

    def train_step():
        optimizer.zero_grad()
        loss, *_ = model(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            inputs["input_labels_list"], inputs["ingr_input_ids"],
            inputs["ingr_masks"], inputs["ingr_sep_masks"],
            inputs["batch_step_num"], inputs["ingr_id_dict"],
            inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
            predict=False)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()
        return float(loss)

    train_step()  # warmup
    t0 = time.time()
    for _ in range(args.iters):
        train_step()
    train_time = (time.time() - t0) / args.iters
    train_clips_per_sec = total_clips / train_time

    # greedy decode throughput
    from types import SimpleNamespace
    from src.translator import Translator
    model.eval()
    checkpoint = {"model_cfg": model.config, "model": model.state_dict()}
    translator = Translator(SimpleNamespace(cuda=False), checkpoint, model=model)

    def decode_once():
        raw2 = caption_collate([ds[i] for i in range(n)])
        sb, sz, _, ing, al, ac = raw2
        with torch.no_grad():
            translator.translate_batch_greedy(
                [torch.as_tensor(b["input_ids"]) for b in sb],
                [b["video_feature"].float() for b in sb],
                [b["input_mask"].float() for b in sb],
                [torch.as_tensor(b["token_type_ids"]) for b in sb],
                [e["ingr_ids"] for e in ing], [e["ingr_mask"] for e in ing],
                [torch.LongTensor(e["ingr_sep_mask"]) for e in ing],
                [e["ingr_id_dict"] for e in ing],
                [e["oov_word_dict"] for e in ing],
                [a for a in al], [a for a in ac], sz, model)

    decode_once()
    t0 = time.time()
    decode_once()
    decode_time = time.time() - t0
    decode_clips_per_sec = total_clips / decode_time

    result = dict(
        device="cpu", torch_threads=torch.get_num_threads(),
        model_mode=args.model_mode, batch_size=n, total_clips=total_clips,
        step_counts=list(step_sizes),
        train_step_sec=train_time, train_clips_per_sec=train_clips_per_sec,
        decode_sec=decode_time, decode_clips_per_sec=decode_clips_per_sec,
        timestamp=time.strftime("%Y-%m-%d %H:%M:%S"),
    )
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
