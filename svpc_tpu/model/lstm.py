"""Bidirectional LSTM via lax.scan, gate-compatible with torch.nn.LSTM.

The textual re-simulator encodes the step sequence with a 1-layer
bidirectional LSTM (reference model.py:865, :1022-1024).  Gate layout and
initialization follow torch (chunks [i, f, g, o]; uniform(-1/sqrt(H),
1/sqrt(H))) so reference checkpoints can be imported directly.

Step masking: padded steps leave the carry untouched, so the hidden states
at real steps are identical to running an unpadded sequence — including the
backward direction, where padding precedes real steps in scan order.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_scan(x, mask, w_ih, w_hh, b_ih, b_hh, reverse: bool):
    """x (B, S, D), mask (B, S) -> h (B, S, H)."""
    b, s, _ = x.shape
    h_dim = w_hh.shape[1]

    def step(carry, inp):
        h, c = carry
        xt, mt = inp
        gates = xt @ w_ih.T + b_ih + h @ w_hh.T + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = mt[:, None]
        h = jnp.where(m > 0, h_new, h)
        c = jnp.where(m > 0, c_new, c)
        return (h, c), h_new * m

    init = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    xs = (x.transpose(1, 0, 2), mask.T)
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs.transpose(1, 0, 2)


class BiLSTM(nn.Module):
    """1-layer bidirectional LSTM; output (B, S, 2H) = [fwd ; bwd]."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        b, s, d = x.shape
        h = self.hidden_size
        if mask is None:
            mask = jnp.ones((b, s), x.dtype)
        k = 1.0 / math.sqrt(h)
        u = nn.initializers.uniform(scale=2 * k)

        def p(name, shape):
            # torch init: U(-k, k); flax uniform is U(0, scale) so shift.
            return self.param(name, lambda rng, sh: u(rng, sh) - k, shape)

        outs = []
        for direction, reverse in (("fwd", False), ("bwd", True)):
            w_ih = p(f"w_ih_{direction}", (4 * h, d))
            w_hh = p(f"w_hh_{direction}", (4 * h, h))
            b_ih = p(f"b_ih_{direction}", (4 * h,))
            b_hh = p(f"b_hh_{direction}", (4 * h,))
            outs.append(_lstm_scan(x, mask, w_ih, w_hh, b_ih, b_hh, reverse))
        return jnp.concatenate(outs, axis=-1)
