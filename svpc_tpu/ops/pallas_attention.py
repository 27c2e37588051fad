"""Fused multi-head attention kernel (Pallas / Mosaic, TPU).

Replaces the XLA attention core on the fast path: one kernel per
(sequence, head) grid cell computes ``softmax(QK^T/sqrt(d) + addmask) V``
entirely in VMEM, never materializing the (N, nh, L, L) score tensor in
HBM (at the flagship geometry that tensor is ~75 MB per encoder layer —
the dominant HBM traffic of the clip encoder).

Semantics match svpc_tpu.ops (reference model.py:181-220): additive mask
``(1 - m) * -10000``, softmax in f32.  Sequence lengths are padded to the
sublane multiple by the wrapper; the extra keys carry mask 0 and the extra
queries are discarded.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    """One grid cell = a block of sequences, all heads batched on the MXU."""
    bn, nh, lq, dh = q_ref.shape
    lk = k_ref.shape[2]
    q = q_ref[:].reshape(bn * nh, lq, dh)
    k = k_ref[:].reshape(bn * nh, lk, dh)
    v = v_ref[:].reshape(bn * nh, lk, dh)
    m = mask_ref[:]                   # (bn, Lq, Lk) float 1/0

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (bn*nh, Lq, Lk)
    add = ((1.0 - m.astype(jnp.float32)) * -10000.0)[:, None, :, :]
    scores = scores.reshape(bn, nh, lq, lk) * scale + add
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).reshape(bn * nh, lq, lk)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (bn*nh, Lq, dh)
    o_ref[:] = out.reshape(bn, nh, lq, dh).astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """q (N, Lq, H), k/v (N, Lk, H), mask (N, Lq, Lk) or (N, 1, Lk).

    Returns (N, Lq, H).  No dropout (fast/inference path)."""
    n, lq, h = q.shape
    lk = k.shape[1]
    dh = h // num_heads
    scale = 1.0 / math.sqrt(dh)

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    lq_p = _round_up(lq, sub)
    lk_p = _round_up(max(lk, 128), 128)

    mask = jnp.broadcast_to(mask, (n, lq, lk))

    def pad(x, target, axis):
        cfgs = [(0, 0)] * x.ndim
        cfgs[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, cfgs)

    qh = pad(q.reshape(n, lq, num_heads, dh).transpose(0, 2, 1, 3), lq_p, 2)
    kh = pad(k.reshape(n, lk, num_heads, dh).transpose(0, 2, 1, 3), lk_p, 2)
    vh = pad(v.reshape(n, lk, num_heads, dh).transpose(0, 2, 1, 3), lk_p, 2)
    mh = pad(pad(mask, lq_p, 1), lk_p, 2)

    # block of sequences per grid step: amortizes DMA, keeps VMEM bounded.
    # budget = double-buffered in/out blocks + the f32 score scratch
    bytes_el = 2 if q.dtype == jnp.bfloat16 else 4
    bn = 1
    for cand in (8, 4, 2, 1):
        if n % cand != 0:
            continue
        blocks = cand * num_heads * dh * (lq_p * 2 + lk_p * 2) * bytes_el \
            + cand * lq_p * lk_p * 4
        scratch = cand * num_heads * lq_p * lk_p * 4
        if 2 * blocks + scratch < 12_000_000:
            bn = cand
            break

    grid = (n // bn,)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, num_heads, lq_p, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, num_heads, lk_p, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, num_heads, lk_p, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, lq_p, lk_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, num_heads, lq_p, dh),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, num_heads, lq_p, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * num_heads * lq_p * lk_p * dh,
            bytes_accessed=(qh.size + kh.size + vh.size + mh.size) * 4,
            transcendentals=n * num_heads * lq_p * lk_p,
        ),
    )(qh, kh, vh, mh)

    out = out[:, :, :lq, :]                       # drop query padding
    return out.transpose(0, 2, 1, 3).reshape(n, lq, h)
