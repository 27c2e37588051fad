"""Straight-through Gumbel-softmax sampling (on-device).

Equivalent to ``F.gumbel_softmax(logits, tau, hard=True)`` (used by the
textual re-simulator, reference model.py:1018) with jax.random instead of
torch's PRNG — the sampling path is stochastic, so only distributional
equivalence is required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax_st(
    key: jax.Array,
    logits: jnp.ndarray,
    tau: float,
    axis: int = -1,
) -> jnp.ndarray:
    """Hard one-hot sample with straight-through softmax gradients.

    Noise and softmax run in float32 regardless of the activation dtype:
    low-precision gumbel sampling (-log(-log(u)) on a coarse uniform
    grid) and a low-precision softmax over noised logits are exactly the
    kind of rare-tail numerics that can seed a NaN that then poisons the
    whole parameter tree through the gradient clip."""
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g) / tau,
                            axis=axis).astype(logits.dtype)
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], dtype=logits.dtype, axis=axis)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)
