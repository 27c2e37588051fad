"""Loss functions reproducing the reference's exact (quirky) semantics.

All losses use SUM reduction over examples/steps — the reference sums
per-example losses, never averages (model.py:1110-1115, :1188).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = -1


def label_smoothing_kl(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    ext_size: jnp.ndarray,
    label_smoothing: float,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Label-smoothed KL caption loss over an OOV-extended vocabulary.

    Reproduces LabelSmoothingLoss (reference model.py:15-55) including its
    quirks: the model emits *probabilities* (not logits) which are logged
    with ``+1e-12``; the smoothing mass is ``ls/(C-1)`` over all C columns
    of the *actual* extended vocab; ``one_hot[ignore_index=-1] = 0`` zeroes
    the smoothing mass of the LAST column; the gold column gets
    ``1 - label_smoothing`` (scatter overwrites, so a gold in the last
    column still gets full confidence).  KL terms with zero target are 0.

    Args:
      probs: (N, C) probabilities, padded with zeros beyond ``ext_size``.
      labels: (N,) int labels in the extended vocab; IGNORE rows excluded.
      ext_size: scalar or (N,) actual extended vocab size per row.
      label_smoothing: smoothing epsilon in (0, 1].
    Returns sum-reduced scalar loss.
    """
    probs = probs.astype(jnp.float32)
    n, c = probs.shape
    ext_size = jnp.broadcast_to(jnp.asarray(ext_size, jnp.int32), (n,))
    cols = jnp.arange(c, dtype=jnp.int32)[None, :]
    ext = ext_size[:, None]

    smooth = label_smoothing / (ext_size.astype(probs.dtype) - 1.0)
    target = jnp.where(cols < ext, smooth[:, None], 0.0)
    target = jnp.where(cols == ext - 1, 0.0, target)  # one_hot[-1] = 0 quirk
    confidence = 1.0 - label_smoothing
    safe_labels = jnp.clip(labels, 0, c - 1)
    target = jnp.where(cols == safe_labels[:, None], confidence, target)

    logp = jnp.log(probs + eps)
    terms = jnp.where(target > 0, target * (jnp.log(jnp.maximum(target, eps)) - logp), 0.0)
    row_loss = terms.sum(axis=-1)
    valid = (labels != IGNORE).astype(probs.dtype)
    return jnp.sum(row_loss * valid)


def bce_sum(probs: jnp.ndarray, targets: jnp.ndarray,
            mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Binary cross-entropy on probabilities, sum reduction.

    Matches ``nn.BCELoss(reduction="sum")`` (model.py:871) including torch's
    clamp of log outputs at -100.
    """
    # torch clamps log outputs at -100.  Clamping the log *input* instead of
    # branching keeps gradients finite at p∈{0,1} (a `where` with log(0) in
    # the untaken branch still produces NaN gradients under jax.grad).  The
    # floor must be a *normal* f32 (1/denormal overflows to inf in the
    # backward); log(1e-35)≈-80.6, so values only deviate from torch's -100
    # clamp when a sigmoid emits < 1e-35 — i.e. a logit below -80.
    tiny = 1e-35
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(jnp.maximum(probs, tiny)), -100.0)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - probs, tiny)), -100.0)
    loss = -(targets * logp + (1.0 - targets) * log1mp)
    if mask is not None:
        loss = loss * mask
    return jnp.sum(loss)


def asymmetric_loss_sum(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    row_mask: jnp.ndarray | None = None,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Asymmetric multi-label loss on probabilities (ASL).

    Matches the vendored AsymmetricLoss (libs/ASL/src/loss_functions/
    losses.py:5-50) as invoked by the reference: inputs are sigmoid
    probabilities, and only rows with at least one positive verb are scored
    (model.py:1103-1104) — expressed here with ``row_mask``.
    """
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    xs_pos = probs
    xs_neg = jnp.minimum(1.0 - probs + clip, 1.0)
    los_pos = targets * jnp.log(jnp.maximum(xs_pos, eps))
    los_neg = (1.0 - targets) * jnp.log(jnp.maximum(xs_neg, eps))
    loss = los_pos + los_neg
    pt = xs_pos * targets + xs_neg * (1.0 - targets)
    gamma = gamma_pos * targets + gamma_neg * (1.0 - targets)
    # array-exponent pow lowers to exp(gamma*log(base)); clamp the base so
    # base->0 keeps gradients finite (value is identical within f32)
    base = jnp.maximum(1.0 - pt, 1e-38)
    loss = loss * jnp.power(base, gamma)
    if row_mask is not None:
        loss = loss * row_mask[..., None]
    return -jnp.sum(loss)
