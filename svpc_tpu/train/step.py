"""jit-compiled train / eval steps with metric accumulation.

Metrics reproduce the reference bookkeeping: token accuracy over valid
label positions (train.py:32-38), thresholded entity/action P/R counts
(train.py:40-49).  Losses keep the reference's sum semantics, so
data-parallel training sums per-shard losses with ``psum`` — numerically
identical to the single-device reference run.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from svpc_tpu import tokenization as tok
from svpc_tpu.config import Config
from svpc_tpu.train.optim import ema_update
from svpc_tpu.train.state import TrainState


def batch_metrics(out, batch, cfg) -> Dict[str, jnp.ndarray]:
    """Sum-counts for the epoch aggregator."""
    T = cfg.model.max_t_len
    # token accuracy vs the UNMUTATED extended labels (the reference's
    # cal_performance uses the original labels even in video mode, where
    # OOV-labeled positions can never be predicted — train.py:32-38,134-138).
    # The text span is the last T columns in both the dense and packed
    # layouts, whatever the (possibly bucketed) video span length.
    if "clip_video" in batch:
        labels = batch["clip_input_labels"][:, None, -T:]
    else:
        labels = batch["input_labels"][:, :, -T:]
    pred = jnp.argmax(out.prediction_scores, axis=-1)
    valid = labels != tok.IGNORE
    n_correct = jnp.sum((pred == labels) & valid)
    n_word = jnp.sum(valid)

    metrics = dict(
        loss=out.total_loss, caption_loss=out.caption_loss,
        n_correct=n_correct, n_word=n_word,
    )
    if out.ent_probs is not None:
        sup = (batch["step_mask"][..., None]
               * batch["entity_mask"][:, None, :])
        p = (out.ent_probs > 0.5) & (sup > 0)
        metrics.update(
            ent_correct=jnp.sum(batch["alignment"] * p),
            ent_recall=jnp.sum(batch["alignment"] * sup),
            ent_precision=jnp.sum(p),
        )
        row = batch["step_mask"][..., None]
        pa = (out.ac_probs > 0.5) & (row > 0)
        metrics.update(
            ac_correct=jnp.sum(batch["action"] * pa),
            ac_recall=jnp.sum(batch["action"] * row),
            ac_precision=jnp.sum(pa),
        )
    return metrics


def _select_finite(finite, new_tree, old_tree):
    """new_tree where the step was finite, old_tree otherwise."""
    return jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                        new_tree, old_tree)


def make_train_step(model, tx: optax.GradientTransformation, cfg: Config):
    ema_decay = cfg.train.ema_decay
    skip_nonfinite = cfg.train.skip_nonfinite_updates

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        dropout_rng, gumbel_rng = jax.random.split(
            jax.random.fold_in(rng, state.step))

        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": dropout_rng, "gumbel": gumbel_rng})
            return out.total_loss, out

        grads, out = jax.grad(loss_fn, has_aux=True)(state.params["params"])
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)

        new_shadow = state.ema_shadow
        if new_shadow is not None and ema_decay > 0:
            new_shadow = ema_update(
                new_shadow, new_params, state.step.astype(jnp.float32),
                ema_decay)

        metrics = batch_metrics(out, batch, cfg)
        grad_norm = optax.global_norm(grads)
        metrics["grad_norm"] = grad_norm
        if skip_nonfinite:
            # one nonfinite step (a rare bf16 tail event) must not poison
            # the parameters forever: keep the old state and count it
            finite = jnp.isfinite(out.total_loss) & jnp.isfinite(grad_norm)
            new_params = _select_finite(finite, new_params,
                                        state.params["params"])
            new_opt = _select_finite(finite, new_opt, state.opt_state)
            if new_shadow is not None:
                new_shadow = _select_finite(finite, new_shadow,
                                            state.ema_shadow)
            metrics["nonfinite_skipped"] = (~finite).astype(jnp.int32)
        new_state = state.replace(
            params={"params": new_params}, opt_state=new_opt,
            ema_shadow=new_shadow, step=state.step + 1)
        return new_state, metrics

    return train_step


def make_accum_train_step(model, tx: optax.GradientTransformation,
                          cfg: Config):
    """ONE optimizer step consuming A accumulated microbatch gradients
    inside one compiled program (``batches`` carries a leading
    accumulation axis A).

    Bit-compatible with the unfused grad_step/apply_step path the loop
    runs at ``steps_per_dispatch == 1``: the same per-microbatch rng
    folding (``fold_in(fold_in(rng, step), i)`` — the loop's host-side
    ``opt_step`` mirror equals ``state.step`` at every group start), the
    same left-fold gradient sum (a leading zero tree adds exactly), and
    the same apply/EMA/nonfinite guard (``make_apply_step``).  A partial
    epoch-tail group just passes a shorter leading axis — identical to
    the unfused path's partial flush.  Scanned K-fold by
    ``make_multi_train_step`` for ``--steps_per_dispatch K
    --grad_accum_steps A``."""
    grad_step = make_grad_step(model, cfg)
    apply_step = make_apply_step(tx, cfg)

    def accum_step(state: TrainState, batches, rng
                   ) -> Tuple[TrainState, Dict]:
        base = jax.random.fold_in(rng, state.step)
        zeros = jax.tree.map(jnp.zeros_like, state.params["params"])
        n = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def body(acc, xs):
            batch, i = xs
            g, m = grad_step(state.params["params"], batch,
                             jax.random.fold_in(base, i))
            return tree_add(acc, g), m

        acc, ms = jax.lax.scan(body, zeros, (batches, jnp.arange(n)))
        new_state, apply_m = apply_step(state, acc)
        metrics = {k: jnp.sum(v, axis=0) for k, v in ms.items()}
        metrics.update(apply_m)
        return new_state, metrics

    return accum_step


def make_multi_train_step(model, tx: optax.GradientTransformation,
                          cfg: Config):
    """K optimizer steps per device dispatch via ``lax.scan``.

    Takes a stacked batch (leading axis K — data/packing.stack_batches)
    and runs the ordinary train step K times inside ONE compiled program:
    the same ops in the same order as K separate dispatches (the scan body
    IS make_train_step, rng folding by ``state.step`` included), so the
    trajectory is identical — only the per-dispatch RPC latency and K-1
    host round-trips are saved.  Metrics come back stacked (K,) per key;
    ``aggregate_metrics`` sums arrays, so epoch bookkeeping is unchanged.

    With ``cfg.train.grad_accum_steps > 1`` the scan body is
    ``make_accum_train_step`` instead and ``batches`` carries TWO leading
    axes (K, A, ...): K optimizer steps each consuming A accumulated
    microbatch gradients — the dispatch-amortization and accumulation
    levers composed (tests/test_multistep.py)."""
    if cfg.train.grad_accum_steps > 1:
        step_fn = make_accum_train_step(model, tx, cfg)
    else:
        step_fn = make_train_step(model, tx, cfg)

    def multi_step(state: TrainState, batches, rng):
        return jax.lax.scan(lambda st, b: step_fn(st, b, rng),
                            state, batches)

    return multi_step


def make_grad_step(model, cfg: Config):
    """Gradient-accumulation microbatch: grads + metric sums, no update.

    Microbatches keep their own (possibly different) packed shapes; the
    caller tree-sums the grads and applies them with ``make_apply_step``.
    Under sum-loss semantics the accumulated gradient equals the gradient
    of one big batch exactly.
    """

    def grad_step(params, batch, rng):
        dropout_rng, gumbel_rng = jax.random.split(rng)

        def loss_fn(p):
            out = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": dropout_rng, "gumbel": gumbel_rng})
            return out.total_loss, out

        grads, out = jax.grad(loss_fn, has_aux=True)(params)
        return grads, batch_metrics(out, batch, cfg)

    return grad_step


def make_apply_step(tx: optax.GradientTransformation, cfg: Config):
    """Optimizer + EMA update from (accumulated) gradients.

    Returns ``(new_state, {"grad_norm", "nonfinite_skipped"})`` so the
    nonfinite-update guard stays visible in the epoch metrics under
    gradient accumulation too (round-1 advisor finding)."""
    ema_decay = cfg.train.ema_decay
    skip_nonfinite = cfg.train.skip_nonfinite_updates

    def apply_step(state: TrainState, grads
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        new_shadow = state.ema_shadow
        if new_shadow is not None and ema_decay > 0:
            new_shadow = ema_update(
                new_shadow, new_params, state.step.astype(jnp.float32),
                ema_decay)
        grad_norm = optax.global_norm(grads)
        metrics = {"grad_norm": grad_norm}
        if skip_nonfinite:
            finite = jnp.isfinite(grad_norm)
            new_params = _select_finite(finite, new_params,
                                        state.params["params"])
            new_opt = _select_finite(finite, new_opt, state.opt_state)
            if new_shadow is not None:
                new_shadow = _select_finite(finite, new_shadow,
                                            state.ema_shadow)
            metrics["nonfinite_skipped"] = (~finite).astype(jnp.int32)
        new_state = state.replace(
            params={"params": new_params}, opt_state=new_opt,
            ema_shadow=new_shadow, step=state.step + 1)
        return new_state, metrics

    return apply_step


def tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def make_eval_step(model, cfg: Config):
    def eval_step(params, batch, rng) -> Dict:
        out = model.apply(params, batch, deterministic=True,
                          rngs={"gumbel": rng})
        return batch_metrics(out, batch, cfg)

    return eval_step


def aggregate_metrics(metric_list) -> Dict[str, float]:
    """Epoch-level aggregation mirroring the reference logs.

    Values may be scalars or stacked (K,) arrays from a multi-step scan
    dispatch — both sum into the same epoch totals."""
    sums: Dict[str, float] = {}
    for m in metric_list:
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(np.sum(v))
    n_word = max(sums.get("n_word", 1.0), 1.0)
    out = dict(
        loss_per_word=sums.get("loss", 0.0) / n_word,
        acc=sums.get("n_correct", 0.0) / n_word,
        nonfinite_skipped=int(sums.get("nonfinite_skipped", 0)),
    )

    def f1(c, r, p):
        recall = c / r if r else 0.0
        precision = c / p if p else 0.0
        if recall == 0 and precision == 0:
            return dict(recall=0.0, precision=0.0, f1=0.0)
        return dict(recall=recall, precision=precision,
                    f1=2 * recall * precision / (recall + precision))

    if "ent_correct" in sums:
        out["entity"] = f1(sums["ent_correct"], sums["ent_recall"],
                           sums["ent_precision"])
        out["action"] = f1(sums["ac_correct"], sums["ac_recall"],
                           sums["ac_precision"])
    return out
