"""Shared CLI argument handling.

One argument surface for train / evaluate / dump-memories (the reference
duplicates ~150 argparse lines across three scripts; SURVEY §5 config).
"""

from __future__ import annotations

import argparse
import json
import os

from svpc_tpu.config import (
    MODEL_TYPE_TO_MODE, Config, DataConfig, ModelConfig, TrainConfig)


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--model_type", choices=list(MODEL_TYPE_TO_MODE),
                   default="vivt", help="vivt=full viv=reason_copy vi=copy v=video")
    p.add_argument("--data_dir", default="densevid_eval/yc2_data")
    p.add_argument("--video_feature_dir", required=True)
    p.add_argument("--duration_file", required=True)
    p.add_argument("--word2idx_path", default="cache/yc2_word2idx.json")
    p.add_argument("--verb2idx_path", default="cache/bosselut_verb_vocab.json")
    p.add_argument("--glove_path", default="")
    p.add_argument("--verb_glove_path", default="")
    # architecture knobs (reference train.py:471-509; defaults are the
    # experiment of record)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--intermediate_size", type=int, default=768)
    p.add_argument("--lstm_hidden_size", type=int, default=768)
    p.add_argument("--num_hidden_layers", type=int, default=2)
    p.add_argument("--num_attention_heads", type=int, default=12)
    p.add_argument("--word_vec_size", type=int, default=300)
    p.add_argument("--video_feature_size", type=int, default=3072)
    p.add_argument("--type_vocab_size", type=int, default=4)
    p.add_argument("--hidden_dropout_prob", type=float, default=0.1)
    p.add_argument("--attention_probs_dropout_prob", type=float,
                   default=0.1)
    p.add_argument("--layer_norm_eps", type=float, default=1e-12)
    p.add_argument("--initializer_range", type=float, default=0.02)
    p.add_argument("--share_wd_cls_weight", action="store_true",
                   help="tie the LM head to the word embedding (requires "
                        "word_vec_size == hidden_size)")
    p.add_argument("--use_asl", default="asl", choices=["asl", "bce"],
                   help="action-supervision loss (reference train.py:512)")
    p.add_argument("--grad_clip", type=float, default=1.0,
                   help="global grad-norm clip; -1 disables "
                        "(reference train.py:528)")
    p.add_argument("--lr_warmup_proportion", type=float, default=0.1)
    p.add_argument("--dset_name", default="yc2", choices=["yc2", "anet"])
    p.add_argument("--num_workers", type=int, default=0,
                   help="threads for the native feature fill (the fill "
                        "releases the GIL; the reference's flag is the "
                        "triple-dashed '---num_workers', train.py:554)")
    p.add_argument("--temperature", type=float, default=0.5)
    p.add_argument("--lam", type=float, default=0.5)
    p.add_argument("--max_n_sen", type=int, default=12)
    p.add_argument("--max_t_len", type=int, default=22)
    p.add_argument("--max_v_len", type=int, default=100)
    p.add_argument("--max_i_len", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--val_batch_size", type=int, default=50)
    p.add_argument("--n_epoch", type=int, default=50)
    p.add_argument("--max_es_cnt", type=int, default=10,
                   help="early-stop patience (reference train.py:541)")
    p.add_argument("--save_mode", choices=["all", "best"], default="best")
    p.add_argument("--seed", type=int, default=2019)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--freeze_glove", action="store_true",
                   help="do not train the GloVe-initialized tables")
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--optimizer_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of Adam moments + EMA shadow "
                        "(bfloat16 halves optimizer HBM traffic; math "
                        "stays f32)")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/decoder layers on the "
                        "backward pass (jax.checkpoint): ~num_layers x "
                        "less activation memory for one extra layer "
                        "forward; values unchanged")
    p.add_argument("--dp_size", type=int, default=1)
    p.add_argument("--tp_size", type=int, default=1,
                   help="tensor-parallel mesh axis (Megatron-style "
                        "attention/FFN/vocab sharding; vocab tables are "
                        "zero-padded to a tp multiple)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard Adam moments + EMA shadow over the "
                        "dp axis (per-device optimizer memory / dp; "
                        "numerics unchanged — grads stay replicated so "
                        "both grad-norm clips see full gradients)")
    p.add_argument("--pp_size", type=int, default=1,
                   help="pipeline-parallel stage count (dp x pp mesh): "
                        "encoder/decoder trunks run the GPipe schedule "
                        "(svpc_tpu/parallel/pipeline.py); must divide "
                        "num_hidden_layers; trajectory-identical to pp=1 "
                        "up to dropout sampling (exact with dropout 0)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="microbatches per pipeline dispatch (0 = auto: "
                        "2 * pp_size)")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="host batches per optimizer step; exact under "
                        "sum-loss semantics (effective batch = "
                        "batch_size * grad_accum_steps)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="optimizer steps per device call: K > 1 scans K "
                        "stacked batches in one compiled program — same "
                        "trajectory, K-fold fewer dispatch RPCs; composes "
                        "with --grad_accum_steps (each scanned step then "
                        "accumulates that many microbatch gradients)")
    p.add_argument("--no_pack_clips", action="store_true",
                   help="disable clip packing (compute the full padded "
                        "(B, S) step grid like the reference)")
    p.add_argument("--length_group", type=int, default=0,
                   help="sort windows of K*batch_size shuffled videos by "
                        "clip length before batching (smaller video-span "
                        "buckets under packing); 0 = uniform shuffle")
    p.add_argument("--debug", action="store_true")


def reject_pp(args, parser) -> None:
    """Inference-side CLIs take the common --pp_size flag (shared arg
    surface) but never pipeline: decode is latency-bound KV-cached work
    where pipeline stages would only add hand-off latency.  Fail loudly
    instead of silently ignoring the flag."""
    if getattr(args, "pp_size", 1) > 1:
        parser.error("--pp_size applies to cli.train only; decode runs "
                     "the KV-cached incremental path where a pipeline "
                     "would only add stage hand-off latency (scale "
                     "inference with --dp_size/--tp_size instead)")


def config_from_args(args) -> Config:
    with open(args.word2idx_path) as f:
        vocab_size = len(json.load(f))
    with open(args.verb2idx_path) as f:
        action_vocab_size = len(json.load(f))
    cfg = Config(
        model=ModelConfig(
            vocab_size=vocab_size, action_vocab_size=action_vocab_size,
            model_mode=MODEL_TYPE_TO_MODE[args.model_type],
            temperature=args.temperature, lambda_=args.lam,
            max_n_sen=args.max_n_sen, max_t_len=args.max_t_len,
            max_v_len=args.max_v_len, max_i_len=args.max_i_len,
            label_smoothing=args.label_smoothing,
            hidden_size=args.hidden_size,
            intermediate_size=args.intermediate_size,
            lstm_hidden_size=args.lstm_hidden_size,
            num_hidden_layers=args.num_hidden_layers,
            num_attention_heads=args.num_attention_heads,
            word_vec_size=args.word_vec_size,
            video_feature_size=args.video_feature_size,
            type_vocab_size=args.type_vocab_size,
            hidden_dropout_prob=args.hidden_dropout_prob,
            attention_probs_dropout_prob=args.attention_probs_dropout_prob,
            layer_norm_eps=args.layer_norm_eps,
            initializer_range=args.initializer_range,
            share_wd_cls_weight=args.share_wd_cls_weight,
            use_asl=args.use_asl == "asl",
            compute_dtype=args.compute_dtype, use_pallas=args.use_pallas,
            remat=args.remat,
            vocab_pad_multiple=max(1, args.tp_size)),
        data=DataConfig(
            dset_name=args.dset_name,
            data_dir=args.data_dir,
            video_feature_dir=args.video_feature_dir,
            duration_file=args.duration_file,
            word2idx_path=args.word2idx_path,
            verb2idx_path=args.verb2idx_path,
            glove_path=args.glove_path,
            verb_glove_path=args.verb_glove_path,
            num_workers=args.num_workers),
        train=TrainConfig(
            batch_size=args.batch_size, val_batch_size=args.val_batch_size,
            n_epoch=args.n_epoch, max_es_cnt=args.max_es_cnt,
            save_mode=args.save_mode, seed=args.seed, lr=args.lr,
            grad_clip=args.grad_clip,
            lr_warmup_proportion=args.lr_warmup_proportion,
            ema_decay=args.ema_decay, freeze_glove=args.freeze_glove,
            dp_size=args.dp_size,
            tp_size=args.tp_size,
            pp_size=args.pp_size,
            pp_microbatches=args.pp_microbatches,
            zero1=args.zero1,
            optimizer_dtype=args.optimizer_dtype,
            grad_accum_steps=args.grad_accum_steps,
            steps_per_dispatch=args.steps_per_dispatch,
            # only cli.train defines --checkpoint_every_steps: the one
            # getattr that is load-bearing (eval/serve/dump CLIs share
            # this builder)
            checkpoint_every_steps=getattr(args, "checkpoint_every_steps",
                                           0),
            # train-only, like checkpoint_every_steps
            multihost_sharded_data=getattr(args, "multihost_sharded_data",
                                           False),
            pack_clips=not args.no_pack_clips,
            length_group=args.length_group,
            debug=args.debug),
    )
    # fail fast with the config's own message (e.g. hidden_size not
    # divisible by num_attention_heads) instead of a mid-compile reshape
    # error deep inside jax
    cfg.model.validate()
    return cfg


def adopt_checkpoint_sidecar(cfg: Config, checkpoint_path: str) -> Config:
    """Adopt training-time fields that change the stored tree from the
    checkpoint's cfg sidecar: a tp>1 run pads vocab tables
    (vocab_pad_multiple -> 952-row embeddings) and optimizer_dtype
    bfloat16 stores m/v/EMA rounded — without these the restore template's
    shapes/dtypes can't match the checkpoint; ema_decay=0 runs carry no
    ema_shadow entry at all."""
    sidecar = os.path.abspath(checkpoint_path) + ".cfg.json"
    if os.path.exists(sidecar):
        saved = Config.from_json(sidecar)
        if saved.model.vocab_pad_multiple != cfg.model.vocab_pad_multiple:
            cfg = cfg.replace_model(
                vocab_pad_multiple=saved.model.vocab_pad_multiple)
        if saved.train.optimizer_dtype != cfg.train.optimizer_dtype:
            cfg = cfg.replace_train(
                optimizer_dtype=saved.train.optimizer_dtype)
        if saved.train.ema_decay != cfg.train.ema_decay:
            cfg = cfg.replace_train(ema_decay=saved.train.ema_decay)
    return cfg


def load_eval_model(cfg: Config, args, make_ds):
    """(cfg, model, eval_params, dataset) for the offline tools.

    Loads either an orbax checkpoint (via restore_train_state) or, with
    ``--torch_checkpoint``, a reference PyTorch ``.chkpt`` whose geometry
    overrides the config.  ``make_ds(cfg)`` builds the dataset — called
    after any geometry override.  Shared by evaluate / dump_memories /
    caption (the same torch-vs-orbax branch used to be triplicated).
    """
    torch_ckpt = getattr(args, "torch_checkpoint", False)
    if torch_ckpt:
        from svpc_tpu.model.load_reference import import_reference_checkpoint
        cfg, model, eval_params = import_reference_checkpoint(
            args.checkpoint, cfg)
    else:
        cfg = adopt_checkpoint_sidecar(cfg, args.checkpoint)
    ds = make_ds(cfg)
    if len(ds) == 0:
        # e.g. every feature file missing — fail with the reason instead
        # of an opaque StopIteration from the sample-batch draw below
        missing = getattr(ds, "missing", [])
        detail = (f" ({len(missing)} video(s) dropped for missing feature "
                  f"files, e.g. {', '.join(missing[:5])})" if missing else "")
        raise SystemExit(f"dataset is empty{detail}")
    if len(ds) < cfg.train.val_batch_size:
        cfg = cfg.replace_train(val_batch_size=len(ds))
    if not torch_ckpt:
        sample, _ = next(iter(ds.batches(cfg.train.val_batch_size)))
        from svpc_tpu.train.loop import restore_train_state
        model, state = restore_train_state(cfg, sample, args.checkpoint)
        eval_params = state.eval_params()
    return cfg, model, eval_params, ds
