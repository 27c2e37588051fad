"""End-to-end training loop.

Mirrors the reference driver (src/train.py:334-460): per-epoch training,
teacher-forced validation on the EMA model, greedy decoding + language
metrics, best-by-CIDEr checkpointing with early stopping — but batched,
jit-compiled, and data-parallel over a device mesh.
"""

from __future__ import annotations

import itertools
import json
import logging
import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from svpc_tpu.config import Config
from svpc_tpu.data.pipeline import CaptionDataset
from svpc_tpu.decode.greedy import greedy_decode
from svpc_tpu.decode.postprocess import (
    batch_to_sentences, build_submission, collect_results)
from svpc_tpu.evaluation.para_eval import evaluate_submission
from svpc_tpu.model import SVPCModel
from svpc_tpu.parallel.mesh import (
    make_mesh, replicated_sharding, shard_batch_multihost, shard_params,
    shard_state_zero1, stacked_batch_sharding, state_shardings)
from svpc_tpu.precision import precision_scope
from svpc_tpu.train.optim import make_optimizer
from svpc_tpu.train.state import TrainState, save_checkpoint
from svpc_tpu.train.step import aggregate_metrics, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def load_glove_into(params, glove_path: str, verb_glove_path: str,
                    model_mode: str, padded_vocab_size: int = 0):
    """GloVe initialization of the word/ingredient/verb embedding tables
    (reference train.py:691-714).  Accepts .npy or torch-saved .pt files.
    ``padded_vocab_size`` > rows zero-pads the table to the tp-padded
    vocab (ModelConfig.vocab_pad_multiple); padding rows are never
    indexed."""

    def load_matrix(path):
        if path.endswith(".npy"):
            return np.load(path).astype(np.float32)
        import torch
        return np.asarray(torch.load(path, weights_only=False),
                          dtype=np.float32)

    p = params["params"]
    if glove_path:
        glove = load_matrix(glove_path)
        if padded_vocab_size > glove.shape[0]:
            glove = np.pad(glove,
                           ((0, padded_vocab_size - glove.shape[0]), (0, 0)))
        p["text_embeddings"]["word_embeddings"]["embedding"] = glove
        if "ingredient_embeddings" in p:
            p["ingredient_embeddings"]["word_embeddings"]["embedding"] = \
                glove.copy()
    if verb_glove_path and model_mode in ("full", "reason_copy"):
        verb = load_matrix(verb_glove_path)
        p["reasoner"]["action_embeddings"] = verb
        if model_mode == "full":
            p["recipe_reasoner"]["action_embeddings"] = verb.copy()
    return params


def init_model(cfg: Config, sample_batch, rng_seed: int = None,
               abstract: bool = False, mesh=None):
    """Build the model and its params.

    ``abstract=True`` returns a ShapeDtypeStruct pytree via eval_shape (no
    compile, no device memory) — the right template for checkpoint restore.
    A ``mesh`` carrying a pp axis > 1 builds the model with its trunks
    routed through the GPipe pipeline (same param tree — init always runs
    the sequential path)."""
    seed = cfg.train.seed if rng_seed is None else rng_seed
    pp_mesh = (mesh if mesh is not None
               and mesh.shape.get("pp", 1) > 1 else None)
    model = SVPCModel(cfg.model, pp_mesh=pp_mesh,
                      pp_microbatches=cfg.train.pp_microbatches)
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "gumbel": jax.random.PRNGKey(seed + 2)}
    jbatch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    with precision_scope(cfg.model):
        if abstract:
            params = jax.eval_shape(
                lambda: model.init(rngs, jbatch, deterministic=True))
        else:
            params = model.init(rngs, jbatch, deterministic=True)
    return model, params


def packing_builder(cfg: Config, mesh=None, n_clips: Optional[int] = None,
                    v_len: Optional[int] = None, local_shards=None):
    """Batch builder for CaptionDataset.batches: the packed layout built
    directly from examples (data/packing.pack_examples — skips two full
    feature copies the dense-stack-then-gather path pays).

    ``n_clips``/``v_len`` pin the packed shape (one compile — right for
    eval); left None they bucket per batch (a handful of compiles — right
    for shuffled training).  Under data parallelism each dp shard packs
    separately (clips co-located with their videos' arrays).
    ``local_shards`` restricts construction to those dp shards' blocks
    (the per-host sharded data mode — pack_examples docstring); None
    builds the full batch.  Returns None when packing is disabled."""
    if not cfg.train.pack_clips:
        return None
    from svpc_tpu.data.packing import pack_examples
    dp = mesh.shape.get("dp", 1) if mesh is not None else 1

    def build(examples, batch_size):
        return pack_examples(
            examples, cfg.model.max_t_len, batch_size=batch_size,
            n_clips=n_clips, v_len=v_len,
            clip_multiple=cfg.train.pack_clip_multiple,
            v_multiple=cfg.train.pack_v_multiple, dp_shards=dp,
            fill_workers=cfg.data.num_workers, only_shards=local_shards)

    return build


def group_stack_batches(batch_iter, k: int, max_t_len: int,
                        dp_shards: int = 1, accum: int = 1):
    """Group K (or K*accum) consecutive (batch, metas) pairs into one
    stacked batch for a k-steps-per-dispatch scan
    (data/packing.stack_batches).  With ``accum > 1`` the stack is
    reshaped to (K, accum, ...) — K optimizer steps of ``accum``
    accumulated microbatches each (train/step.make_accum_train_step).
    The epoch tail never drops data: it yields the largest whole
    accumulation groups first, then one (1, r < accum) partial group —
    the same partial-flush semantics as the unfused accumulation path.
    Metas split at the SAME boundary as the batches (per-batch meta
    lists are kept until emission), so a consumer keying on
    metas-per-group sees each video exactly once, attached to the group
    that actually carries its batch (round-4 ADVICE)."""
    from svpc_tpu.data.packing import stack_batches

    def emit(group, meta_groups):
        stacked = stack_batches(group, max_t_len, dp_shards)
        if accum > 1:
            stacked = {key: v.reshape((len(group) // accum, accum)
                                      + v.shape[1:])
                       for key, v in stacked.items()}
        return stacked, [m for ms in meta_groups for m in ms]

    buf, metas = [], []
    for batch, ms in batch_iter:
        buf.append(batch)
        metas.append(list(ms))
        if len(buf) == k * accum:
            yield emit(buf, metas)
            buf, metas = [], []
    if buf:
        q, r = divmod(len(buf), accum)
        if q:
            yield emit(buf[:q * accum], metas[:q * accum])
        if r:  # accum > 1 by construction (divmod(n, 1) has r == 0)
            stacked = stack_batches(buf[q * accum:], max_t_len, dp_shards)
            yield ({key: v[None] for key, v in stacked.items()},
                   [m for ms in metas[q * accum:] for m in ms])


def eval_packing_builder(cfg: Config, mesh, dataset, batch_size: int):
    """Eval-time packing: pin ONE packed shape across all of the dataset's
    (deterministic) batches so the compiled program is reused exactly."""
    from svpc_tpu.data.packing import fixed_clip_budget
    return packing_builder(
        cfg, mesh,
        n_clips=fixed_clip_budget(
            dataset, batch_size, cfg.train.pack_clip_multiple,
            dp_shards=mesh.shape.get("dp", 1) if mesh else 1),
        v_len=cfg.model.max_v_len)


def cast_transform(cfg: Config):
    """bf16 feature cast (halves host->device feature traffic); None on
    the f32 parity path."""
    if cfg.model.compute_dtype != "bfloat16":
        return None
    import ml_dtypes  # numpy bf16 support (jax dependency)

    def transform(b):
        key = ("clip_video_feature" if "clip_video_feature" in b
               else "video_feature")
        b = dict(b)
        b[key] = b[key].astype(ml_dtypes.bfloat16)
        return b

    return transform


def restore_train_state(cfg: Config, sample_batch, checkpoint_path: str):
    """(model, TrainState) from an orbax checkpoint, without compiling any
    forward pass — abstract shape templates drive the restore.  Shared by
    the evaluate / dump_memories / export_checkpoint CLIs."""
    import functools
    from svpc_tpu.train.state import load_checkpoint
    model, params = init_model(cfg, sample_batch, abstract=True)
    tx = make_optimizer(cfg.train, 1, model_mode=cfg.model.model_mode,
                        n_layers=cfg.model.num_hidden_layers)
    state = jax.eval_shape(functools.partial(
        TrainState.create, tx=tx, use_ema=cfg.train.ema_decay > 0,
        ema_dtype=cfg.train.optimizer_dtype), params)
    return model, load_checkpoint(checkpoint_path, state)


def eval_batch_size(cfg: Config, dataset_len: int, mesh=None) -> int:
    """Effective decode batch size: no bigger than the dataset (a 4-video
    run with the default 50 would pad 12x and compile a huge program),
    rounded up to a dp-mesh multiple so shard_batch can split it (the
    pipeline pads every batch to this size)."""
    eff = max(1, min(cfg.train.val_batch_size, dataset_len))
    if mesh is not None:
        dp = mesh.shape.get("dp", 1)
        eff = ((eff + dp - 1) // dp) * dp
    return eff


def make_eval_decoder(model, cfg: Config, dataset: CaptionDataset,
                      mesh=None, beam_size: int = 0, n_best: int = 1):
    """Build the jitted decode fn + packing builder ONCE — per-epoch eval
    reuses the compiled program instead of retracing every call.

    ``n_best > 1`` (beam only) makes the jitted fn return
    ``(tokens (B,n,S,T), scores (B,n,S))`` ranked best-first."""
    eff_bs = eval_batch_size(cfg, len(dataset), mesh)
    cfg = cfg.replace_train(val_batch_size=eff_bs)
    from svpc_tpu.runtime import transient_retry
    if beam_size and beam_size > 1:
        from svpc_tpu.decode.beam import beam_decode
        jit_decode = jax.jit(
            lambda p, b: beam_decode(model, p, b, beam_size=beam_size,
                                     n_best=n_best))
    else:
        jit_decode = jax.jit(
            lambda p, b: greedy_decode(model, p, b))
    # eval decodes compile a new program per (batch, pack) shape — the
    # recompile RPC can flake on the TPU tunnel; reissue (no donation here)
    jit_decode = transient_retry(jit_decode, what="decode")
    builder = eval_packing_builder(cfg, mesh, dataset, eff_bs)
    return dict(cfg=cfg, jit=jit_decode, builder=builder,
                transform=cast_transform(cfg), mesh=mesh)


def _decode_batches(params, dataset: CaptionDataset, decoder,
                    max_batches: Optional[int] = None):
    """Yield ``(jitted-decode output, metas)`` per eval batch — the one
    transform/shard/decode loop shared by the greedy and n-best paths
    (both consumers drain it fully, so the precision scope opens and
    closes within one call)."""
    cfg = decoder["cfg"]
    n = 0
    with precision_scope(cfg.model):
        for batch, metas in dataset.batches(cfg.train.val_batch_size,
                                            shuffle=False,
                                            builder=decoder["builder"]):
            if decoder["transform"] is not None:
                batch = decoder["transform"](batch)
            if decoder["mesh"] is not None:
                batch = shard_batch_multihost(decoder["mesh"], batch)
            yield decoder["jit"](params, batch), metas
            n += 1
            if max_batches and n >= max_batches:
                return


def run_greedy_eval(model, params, dataset: CaptionDataset, cfg: Config,
                    mesh=None, max_batches: Optional[int] = None,
                    beam_size: int = 0, decoder=None) -> dict:
    """Decode a whole dataset into a submission dict (greedy by default;
    ``beam_size>1`` uses batched beam search).  Pass ``decoder`` from
    ``make_eval_decoder`` to reuse one compiled program across calls."""
    if decoder is None:
        decoder = make_eval_decoder(model, cfg, dataset, mesh, beam_size)
    results = None
    for ids, metas in _decode_batches(params, dataset, decoder,
                                      max_batches):
        sentences = batch_to_sentences(np.asarray(ids), metas,
                                       dataset.vocab)
        results = collect_results(sentences, metas, results)
    return build_submission(results or {})


def run_nbest_eval(model, params, dataset: CaptionDataset, cfg: Config,
                   beam_size: int, n_best: int, mesh=None,
                   max_batches: Optional[int] = None) -> dict:
    """Beam-decode a dataset keeping the top-``n_best`` ranked hypotheses
    per (video, step) (the reference's advertised ``--n_best`` surface,
    train.py:546-548).  Returns a submission-shaped dict whose entries
    carry ``nbest: [{sentence, score}, ...]`` best-first (entry
    ``sentence`` is rank 0, so the dict still evaluates as a normal
    submission)."""
    decoder = make_eval_decoder(model, cfg, dataset, mesh,
                                beam_size=beam_size, n_best=n_best)
    results = None
    for (tokens, scores), metas in _decode_batches(params, dataset,
                                                   decoder, max_batches):
        tokens, scores = np.asarray(tokens), np.asarray(scores)
        per_rank = [batch_to_sentences(tokens[:, r], metas, dataset.vocab)
                    for r in range(n_best)]
        nbest = [[{"nbest": [{"sentence": per_rank[r][b][s],
                              "score": float(scores[b, r, s])}
                             for r in range(n_best)]}
                  for s in range(meta["n_steps"])]
                 for b, meta in enumerate(metas)]
        results = collect_results(per_rank[0], metas, results,
                                  extras=nbest)
    return build_submission(results or {})


class TBWriter:
    """Optional TensorBoard writer (reference logs scalars via tensorboardX,
    train.py:359,387-421); torch's bundled writer is used when available."""

    def __init__(self, logdir: str, enabled: bool = True):
        self._w = None
        if enabled:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._w = SummaryWriter(logdir)
            except Exception:
                logger.info("tensorboard writer unavailable; csv logs only")

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def close(self):
        if self._w is not None:
            self._w.close()


def train(cfg: Config, workdir: str,
          max_steps_per_epoch: Optional[int] = None,
          eval_language: bool = True,
          tensorboard: bool = True,
          profile_steps: int = 0,
          debug_nans: bool = False,
          resume_from: Optional[str] = None) -> Dict:
    if debug_nans:
        # analog of the reference's always-on autograd anomaly detection
        # (train.py:85,177), off by default for speed
        jax.config.update("jax_debug_nans", True)
    os.makedirs(workdir, exist_ok=True)
    cfg.to_json(os.path.join(workdir, "config.json"))

    train_ds = CaptionDataset(cfg, "train", lazy_features=True)
    val_ds = CaptionDataset(cfg, "val", lazy_features=True)
    logger.info("train videos: %d, val videos: %d", len(train_ds), len(val_ds))
    if cfg.train.pp_size > 1 \
            and cfg.model.num_hidden_layers % cfg.train.pp_size:
        raise ValueError(
            f"pp_size={cfg.train.pp_size} must divide num_hidden_layers="
            f"{cfg.model.num_hidden_layers} (each pipeline stage takes an "
            "equal contiguous block of trunk layers)")
    mesh_n = cfg.train.dp_size * cfg.train.tp_size * cfg.train.pp_size
    mesh = make_mesh(cfg.train.dp_size, cfg.train.tp_size,
                     cfg.train.pp_size) if mesh_n > 1 else None
    if len(val_ds):
        # cap at the dataset size, rounded to a dp-mesh multiple so the
        # padded eval batches shard cleanly
        cfg = cfg.replace_train(
            val_batch_size=eval_batch_size(cfg, len(val_ds), mesh))

    sample_batch, _ = next(iter(train_ds.batches(cfg.train.batch_size)))
    model, params = init_model(cfg, sample_batch, mesh=mesh)
    params = load_glove_into(params, cfg.data.glove_path,
                             cfg.data.verb_glove_path, cfg.model.model_mode,
                             cfg.model.padded_vocab_size)
    if cfg.train.pp_size > 1:
        # pipeline-RESIDENT parameter layout: the trunks' layer_i
        # families collapse into stacked `layers` subtrees that shard
        # P("pp", ...) at rest — each stage group stores only its own
        # layer block, and the Adam moments + EMA shadow (created below
        # from this tree) inherit the same residency
        # (parallel/pipeline.stack_trunk_params)
        from svpc_tpu.parallel.pipeline import stack_trunk_params
        params = stack_trunk_params(params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    n_frozen = 0
    if cfg.train.freeze_glove:
        # the reference counts trainable from requires_grad (utils.py:
        # 32-45); freeze_glove is our requires_grad=False equivalent
        from svpc_tpu.train.optim import _is_glove_path
        n_frozen = sum(
            int(np.prod(p.shape)) for path, p in
            jax.tree_util.tree_flatten_with_path(params)[0]
            if _is_glove_path(path))
    logger.info("Parameter Count: all %s; trainable %s",
                f"{n_params:,d}", f"{n_params - n_frozen:,d}")

    accum = max(1, cfg.train.grad_accum_steps)
    steps_per_epoch = math.ceil(len(train_ds) / cfg.train.batch_size)
    # the LR schedule counts OPTIMIZER steps, of which accumulation takes
    # one per `accum` host batches
    tx = make_optimizer(cfg.train, math.ceil(steps_per_epoch / accum),
                        model_mode=cfg.model.model_mode,
                        n_layers=cfg.model.num_hidden_layers)
    state = TrainState.create(params, tx, use_ema=cfg.train.ema_decay > 0,
                              ema_dtype=cfg.train.optimizer_dtype)
    start_epoch = 0
    resume_skip = 0  # host batches already consumed inside start_epoch
    if resume_from:
        from svpc_tpu.train.state import load_checkpoint
        state = load_checkpoint(resume_from, state)
        start_epoch = int(state.epoch) + 1
        # a mid-epoch checkpoint carries a .progress.json sidecar naming
        # the epoch it was taken in and how many host batches were done;
        # the deterministic shuffle (seed+epoch) + step-keyed rng folding
        # make skipping those batches trajectory-exact
        prog_path = os.path.abspath(resume_from) + ".progress.json"
        if os.path.exists(prog_path):
            try:
                with open(prog_path) as f:
                    prog = json.load(f)
            except (json.JSONDecodeError, OSError) as e:
                # a torn sidecar must degrade to epoch-restart, never
                # block the resume it exists to enable
                logger.warning("unreadable progress sidecar %s (%s) — "
                               "restarting the epoch", prog_path, e)
                prog = {}
            if prog.get("step", int(state.step)) != int(state.step):
                # torn pair (crash between checkpoint and sidecar):
                # fall back to restarting the epoch from its first batch
                logger.warning(
                    "progress sidecar step %s != checkpoint step %d — "
                    "ignoring it and restarting the epoch",
                    prog.get("step"), int(state.step))
            elif prog.get("batches_done", -1) >= 0:
                start_epoch = int(prog["epoch"])
                resume_skip = int(prog["batches_done"])
        logger.info("resumed from %s at step %d (epoch %d%s)",
                    resume_from, int(state.step), start_epoch,
                    f", skipping {resume_skip} batches" if resume_skip
                    else "")
    if mesh is not None:
        # place the whole TrainState by the TP partition rules: params /
        # optimizer moments / EMA shadow leaves share the same dict paths,
        # so one tree_map shards them consistently; everything else
        # (scalars, schedules) replicates.  On a dp-only mesh every spec
        # resolves to replication — identical to the old replicate().
        state = shard_params(mesh, state)

    step_out_shardings = None
    if mesh is not None and cfg.train.zero1:
        # ZeRO-1: moments + EMA shadow shard over dp (composing with the
        # pp residency of stacked trunk leaves); pin the layout on the
        # step outputs so it persists (and donation stays in-place)
        state = shard_state_zero1(mesh, state)
        step_out_shardings = (state_shardings(state),
                              replicated_sharding(mesh))
    elif mesh is not None and cfg.train.pp_size > 1:
        # pin the pp-resident stacked layout across steps the same way
        step_out_shardings = (state_shardings(state),
                              replicated_sharding(mesh))

    # transient_retry: mid-epoch recompiles go over the TPU-tunnel RPC,
    # which can flake (svpc_tpu/runtime.py) — reissue instead of dying
    from svpc_tpu.runtime import transient_retry
    spd = max(1, cfg.train.steps_per_dispatch)
    if spd > 1:
        # K optimizer steps per device call: same trajectory, ~K-fold
        # fewer dispatch RPCs (train/step.make_multi_train_step); with
        # accum > 1 each scanned step consumes A accumulated microbatch
        # gradients (make_accum_train_step inside the scan)
        from svpc_tpu.train.step import make_multi_train_step
        train_step = transient_retry(
            jax.jit(make_multi_train_step(model, tx, cfg), donate_argnums=0,
                    out_shardings=step_out_shardings),
            what="multi train step")
    else:
        train_step = transient_retry(
            jax.jit(make_train_step(model, tx, cfg), donate_argnums=0,
                    out_shardings=step_out_shardings), what="train step")
    if accum > 1 and spd == 1:
        from svpc_tpu.train.step import make_apply_step, make_grad_step, \
            tree_add
        grad_step = transient_retry(jax.jit(make_grad_step(model, cfg)),
                                    what="grad step")
        apply_step = transient_retry(
            jax.jit(make_apply_step(tx, cfg), donate_argnums=0,
                    out_shardings=step_out_shardings), what="apply step")
        add_grads = jax.jit(tree_add, donate_argnums=(0,))
    eval_step = transient_retry(jax.jit(make_eval_step(model, cfg)),
                                what="eval step")
    from svpc_tpu.train.optim import training_rng
    rng = training_rng(cfg.train.seed, cfg.train.rng_impl)

    # csv logs, same columns as the reference (train.py:370-372); a
    # resumed run in the same workdir appends instead of truncating
    def open_log(name: str, header: str):
        path = os.path.join(workdir, name)
        if bool(resume_from) and os.path.exists(path):
            # keep only pre-resume rows so a re-run epoch is not logged
            # twice with conflicting values
            with open(path) as f:
                lines = f.readlines()
            kept = [ln for ln in lines[1:]
                    if ln.split(",", 1)[0].isdigit()
                    and int(ln.split(",", 1)[0]) < start_epoch]
            f = open(path, "w")
            f.write(lines[0] if lines else header)
            f.writelines(kept)
            f.flush()  # rewrite survives a crash before the next row
            return f
        f = open(path, "w")
        f.write(header)
        f.flush()
        return f

    train_log = open_log("train.log.csv", "epoch,loss,ppl,accuracy\n")
    valid_log = open_log(
        "valid.log.csv", "epoch,loss,ppl,accuracy,METEOR,BLEU@4,CIDEr,re4\n")

    from svpc_tpu.data.anet import para_reference_files
    ref_para_path = [p for p in
                     (os.path.join(cfg.data.data_dir, f)
                      for f in para_reference_files(cfg.data.dset_name, "val"))
                     if os.path.exists(p)]
    if eval_language and not ref_para_path:
        logger.warning("no paragraph reference files found for %s/val — "
                       "language eval disabled", cfg.data.dset_name)
        eval_language = False

    val_builder = eval_packing_builder(
        cfg, mesh, val_ds, cfg.train.val_batch_size) if len(val_ds) else None
    feat_cast = cast_transform(cfg)
    # one compiled decode program reused across every epoch's greedy eval.
    # Under pp the KV-cached incremental decode path is sequential by
    # design (per-token work is latency-bound, model/layers.Decoder), so
    # decode runs a sequential-trunk model on unstacked eval params (the
    # teacher-forced eval_step above still pipelines).
    decode_model, unstack_for_decode = model, None
    if cfg.train.pp_size > 1:
        from svpc_tpu.parallel.pipeline import unstack_trunk_params
        decode_model = SVPCModel(cfg.model)
        unstack_for_decode = unstack_trunk_params
    eval_decoder = (make_eval_decoder(decode_model, cfg, val_ds, mesh)
                    if eval_language and len(val_ds) else None)

    opt_step = int(state.step)  # host-side mirror (accum rng folding)
    best_cider = 0.0
    best_score = 0.0 if eval_language else None  # reference: CIDEr > 0 wins
    es_cnt = 0
    history = []
    hist_path = os.path.join(workdir, "history.json")
    if resume_from and os.path.exists(hist_path):
        # resumed in the same workdir: keep the pre-resume epochs, and
        # seed the best-checkpoint selection from them so a worse epoch
        # after resume cannot overwrite checkpoint_best
        with open(hist_path) as f:
            history = [h for h in json.load(f) if h["epoch"] < start_epoch]
        prev = [(h["lang"].get("CIDEr", -1.0) if eval_language
                 else -h["val"]["loss_per_word"]) for h in history]
        if prev:
            if eval_language:
                # never below the fresh-run floor ("CIDEr > 0 wins"),
                # e.g. when prior epochs ran with --no_language_eval
                best_score = max(0.0, max(prev))
            else:
                best_score = max(prev)
            best_cider = max(h["lang"].get("CIDEr", 0.0) for h in history)
            # replay the early-stop counter: consecutive non-improving
            # epochs at the end of the prior run (same comparison the
            # live loop uses, including the CIDEr>0 floor)
            running = 0.0 if eval_language else None
            for s in prev:
                if running is None or s > running:
                    running, es_cnt = s, 0
                else:
                    es_cnt += 1
    ckpt_every = cfg.train.checkpoint_every_steps
    prog_sidecar = os.path.join(workdir, "checkpoint_last.progress.json")

    def save_last(cur_state, completed_epoch: int, batches_done: int,
                  cur_epoch: int):
        """checkpoint_last + .progress.json.  ``completed_epoch`` feeds
        the state's epoch field (last fully finished epoch);
        ``batches_done`` >= 0 marks a mid-epoch save inside
        ``cur_epoch`` (-1 = epoch boundary)."""
        s = jax.device_get(cur_state.replace(
            epoch=jnp.asarray(completed_epoch, jnp.int32)))
        save_checkpoint(workdir, s, cfg, name="checkpoint_last")
        # atomic sidecar write; "step" pins it to its checkpoint so a
        # crash between the two writes is detected at resume
        with open(prog_sidecar + ".tmp", "w") as f:
            json.dump({"epoch": cur_epoch, "batches_done": batches_done,
                       "step": int(s.step)}, f)
        os.replace(prog_sidecar + ".tmp", prog_sidecar)

    tb = TBWriter(workdir, tensorboard)
    profiled = False
    prof_active = False
    prof_n = 0
    global_step = 0  # steps seen this run (compile happens on step 0)
    with precision_scope(cfg.model):
        for epoch in range(start_epoch, cfg.train.n_epoch):
            t0 = time.time()
            metrics = []
            from svpc_tpu.data.prefetch import prefetch_to_device
            from svpc_tpu.parallel.mesh import batch_sharding

            # mid-epoch resume: the shuffle order is deterministic in
            # (seed, epoch), so dropping the already-trained batches at
            # the source (before any example/feature work) reproduces the
            # uninterrupted trajectory exactly
            skip = resume_skip if epoch == start_epoch else 0
            # per-host sharded data mode: this process builds only the
            # packed blocks its own devices hold (identical device bytes
            # — see TrainConfig.multihost_sharded_data); the train
            # iterator only, since eval decodes consume per-host outputs
            # of a globally identical submission anyway
            data_shards = None
            if cfg.train.multihost_sharded_data and mesh is not None \
                    and jax.process_count() > 1:
                from svpc_tpu.parallel.mesh import local_dp_shards
                data_shards = local_dp_shards(mesh)
            host_iter = train_ds.batches(
                cfg.train.batch_size, shuffle=True,
                seed=cfg.train.seed + epoch,
                length_group=cfg.train.length_group,
                builder=packing_builder(cfg, mesh,
                                        local_shards=data_shards),
                skip=skip)
            if max_steps_per_epoch:
                # cap at the SOURCE (before any grouping), so neither a
                # K-step dispatch nor a skip==cap resume can overshoot —
                # the capped trajectory stays identical across modes
                host_iter = itertools.islice(
                    host_iter, max(0, max_steps_per_epoch - skip))
            sharding = batch_sharding(mesh) if mesh is not None else None
            if spd > 1:
                host_iter = group_stack_batches(
                    host_iter, spd, cfg.model.max_t_len,
                    mesh.shape.get("dp", 1) if mesh is not None else 1,
                    accum=accum)
                sharding = (stacked_batch_sharding(
                    mesh, n_leading=2 if accum > 1 else 1)
                            if mesh is not None else None)
            batch_iter = prefetch_to_device(
                host_iter, size=2, sharding=sharding, transform=feat_cast)
            acc_grads = None
            n_micro = 0
            epoch_steps = skip
            for batch, _ in batch_iter:
                if profile_steps and not profiled and not prof_active \
                        and global_step >= 1:
                    # skip the compile step; trace wherever the first
                    # steady-state step falls (a 1-batch epoch means the
                    # trace starts in epoch 1, not never)
                    jax.profiler.start_trace(os.path.join(workdir, "profile"))
                    prof_active = True
                if accum == 1 or spd > 1:
                    state, m = train_step(state, batch, rng)
                else:
                    micro_rng = jax.random.fold_in(
                        jax.random.fold_in(rng, opt_step), n_micro)
                    g, m = grad_step(state.params["params"], batch, micro_rng)
                    acc_grads = g if acc_grads is None else add_grads(
                        acc_grads, g)
                    n_micro += 1
                    if n_micro == accum:
                        state, apply_m = apply_step(state, acc_grads)
                        m = dict(m, **apply_m)
                        acc_grads, n_micro = None, 0
                        opt_step += 1
                metrics.append(m)
                # a multi-step dispatch carries K optimizer steps of
                # accum host batches each (the epoch tail may carry
                # fewer); epoch_steps counts HOST batches (it drives the
                # mid-epoch checkpoint period and resume's batches_done)
                if spd > 1:
                    lead = next(iter(batch.values())).shape
                    n_in = int(lead[0]) * (int(lead[1]) if accum > 1
                                           else 1)
                else:
                    n_in = 1
                global_step += n_in
                epoch_steps += n_in
                if prof_active and not profiled:
                    prof_n += n_in
                if prof_active and not profiled and prof_n >= profile_steps:
                    # sync by host transfer: block_until_ready is a no-op
                    # on the axon TPU tunnel (CLAUDE.md)
                    float(np.sum(jax.device_get(m["loss"])))
                    jax.profiler.stop_trace()
                    profiled = True
                    logger.info("profiler trace written to %s/profile", workdir)
                if ckpt_every and n_micro == 0:
                    # mid-epoch checkpoint at accumulation-group
                    # boundaries, every ckpt_every optimizer steps
                    # (= ckpt_every*accum host batches)
                    period = ckpt_every * accum
                    if (epoch_steps // period) > \
                            ((epoch_steps - n_in) // period):
                        save_last(state, epoch - 1, epoch_steps, epoch)
                if max_steps_per_epoch and epoch_steps >= max_steps_per_epoch:
                    break
            # a break leaves the generator suspended with its producer
            # thread still prefetching (and holding device batches) through
            # the whole eval/checkpoint tail — close it deterministically
            batch_iter.close()
            if acc_grads is not None:
                # flush a partial accumulation group at epoch end — keep
                # its guard metrics too
                state, apply_m = apply_step(state, acc_grads)
                metrics.append(apply_m)
                opt_step += 1
            if prof_active and not profiled:
                # fewer steps remained than requested: finalize the trace
                # with whatever was captured rather than losing it
                jax.profiler.stop_trace()
                profiled = True
                logger.info("profiler trace written to %s/profile (%d of "
                            "%d requested steps)", workdir, prof_n,
                            profile_steps)
            # a mid-epoch resume that landed exactly on the epoch
            # boundary has no steps left in this epoch
            train_m = (aggregate_metrics(jax.device_get(metrics))
                       if metrics else
                       dict(loss_per_word=float("nan"), acc=float("nan")))
            if train_m.get("nonfinite_skipped"):
                logger.warning(
                    "[epoch %d] skipped %d nonfinite update(s) — params "
                    "kept from the previous step", epoch,
                    train_m["nonfinite_skipped"])
            niter = int(state.step)
            tb.scalar("Train/Loss", train_m["loss_per_word"], niter)
            tb.scalar("Train/Acc", train_m["acc"], niter)
            logger.info(
                "[epoch %d] train ppl %.4f acc %.3f (%.1fs)", epoch,
                math.exp(min(train_m["loss_per_word"], 100)),
                100 * train_m["acc"], time.time() - t0)
            train_log.write(f"{epoch},{train_m['loss_per_word']:.5f},"
                            f"{math.exp(min(train_m['loss_per_word'], 100)):.5f},"
                            f"{100 * train_m['acc']:.3f}\n")

            # teacher-forced validation on EMA params (fixed packed shape
            # across epochs -> one eval_step compile)
            eval_params = state.eval_params()
            vmetrics = []
            for j, (batch, _) in enumerate(val_ds.batches(
                    cfg.train.val_batch_size, builder=val_builder)):
                if feat_cast is not None:
                    batch = feat_cast(batch)
                if mesh is not None:
                    batch = shard_batch_multihost(mesh, batch)
                vmetrics.append(eval_step(eval_params, batch,
                                          training_rng(epoch,
                                                       cfg.train.rng_impl)))
                if max_steps_per_epoch and j + 1 >= max_steps_per_epoch:
                    break
            val_m = aggregate_metrics(jax.device_get(vmetrics))

            # greedy decode + language metrics
            lang = {}
            if eval_language:
                dec_params = (unstack_for_decode(eval_params)
                              if unstack_for_decode else eval_params)
                submission = run_greedy_eval(
                    decode_model, dec_params, val_ds, cfg, mesh,
                    max_batches=max_steps_per_epoch,
                    decoder=eval_decoder)
                sub_path = os.path.join(
                    workdir, f"greedy_pred_val_epoch{epoch}.json")
                with open(sub_path, "w") as f:
                    json.dump(submission, f, indent=2)
                lang = evaluate_submission(submission, ref_para_path)
                logger.info(
                    "[epoch %d] val METEOR %.2f B4 %.2f CIDEr %.2f re4 %.2f",
                    epoch, 100 * lang.get("METEOR", 0),
                    100 * lang["Bleu_4"], 100 * lang["CIDEr"],
                    100 * lang["re4"])
                tb.scalar("Val/METEOR", 100 * lang.get("METEOR", 0), niter)
                tb.scalar("Val/Bleu_4", 100 * lang["Bleu_4"], niter)
                tb.scalar("Val/CIDEr", 100 * lang["CIDEr"], niter)
                tb.scalar("Val/Re4", 100 * lang["re4"], niter)
            tb.scalar("Val/Loss", val_m["loss_per_word"], niter)
            tb.scalar("Val/Acc", val_m["acc"], niter)
            valid_log.write(
                f"{epoch},{val_m['loss_per_word']:.5f},"
                f"{math.exp(min(val_m['loss_per_word'], 100)):.5f},"
                f"{100 * val_m['acc']:.3f},"
                f"{100 * lang.get('METEOR', 0):.2f},"
                f"{100 * lang.get('Bleu_4', 0):.2f},"
                f"{100 * lang.get('CIDEr', 0):.2f},"
                f"{100 * lang.get('re4', 0):.2f}\n")
            train_log.flush(); valid_log.flush()
            history.append(dict(epoch=epoch, train=train_m, val=val_m,
                                lang={k: v for k, v in lang.items()
                                      if isinstance(v, (int, float))}))

            # selection metric: CIDEr (the reference's, train.py:428-442);
            # without language eval, fall back to val loss so
            # --no_language_eval runs still keep a best checkpoint and
            # never early-stop on a metric that was never computed
            if eval_language:
                score = lang.get("CIDEr", -1.0)
            else:
                score = -val_m["loss_per_word"]
            # always keep a resumable latest checkpoint (the reference
            # cannot resume mid-training at all — SURVEY §5)
            state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
            save_last(state, epoch, -1, epoch)
            # history lands on disk with every checkpoint, so resuming a
            # crashed run can seed best-score / early-stop state from it
            with open(hist_path, "w") as f:
                json.dump(history, f, indent=2)
            if cfg.train.save_mode == "all":
                # reference naming: metrics in the filename
                # (train.py:424-427, model_e{e}_b{b}_m{m}_c{c}_r{r}.chkpt);
                # without language eval there are no metrics to embed
                tag = f"checkpoint_e{epoch}"
                if lang:
                    tag += (f"_b{round(100 * lang.get('Bleu_4', 0), 2)}"
                            f"_m{round(100 * lang.get('METEOR', 0), 2)}"
                            f"_c{round(100 * lang.get('CIDEr', 0), 2)}"
                            f"_r{round(100 * lang.get('re4', 0), 2)}")
                save_checkpoint(workdir, jax.device_get(state), cfg,
                                name=tag)
            elif best_score is None or score > best_score:
                best_score = score
                best_cider = lang.get("CIDEr", 0.0)
                es_cnt = 0
                save_checkpoint(workdir, jax.device_get(state), cfg,
                                name="checkpoint_best")
            else:
                es_cnt += 1
                if es_cnt > cfg.train.max_es_cnt:
                    logger.info("early stop at epoch %d (best %.4f)",
                                epoch, best_score)
                    break

    tb.close()
    train_log.close(); valid_log.close()
    with open(os.path.join(workdir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    return dict(best_cider=best_cider, history=history, state=state,
                model=model)
