"""Fused multi-head attention kernel (Pallas / Mosaic, TPU).

Flash-attention blocking: the grid walks (sequence, query-block, key-block)
with the key axis innermost; a running (max, sum, accumulator) in VMEM
scratch implements the numerically-stable streaming softmax, so the
(L, L) score matrix never exists in HBM and VMEM stays bounded at ANY
sequence length (the previous whole-sequence kernel OOMed VMEM at
seq >= 1024).

Semantics match svpc_tpu.ops (reference model.py:181-220): additive mask
``(1 - m) * -10000``, softmax in f32.  Key-padding masks (N, 1, Lk) ride a
1D block (no O(L^2) mask in HBM); full (N, Lq, Lk) masks are blocked.

Measured on v5e (tools/bench_attention.py): XLA's fused attention wins at
svpc geometry (<=128-token clips); this kernel wins from ~256 tokens and
is the long-sequence on-ramp.  `use_pallas` stays off by default for the
captioning workload.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, scale: float):
    """One grid cell: (sequence block b, query block iq, key block ik).

    q_ref (bn, nh, bq, dh); k_ref/v_ref (bn, nh, bk, dh);
    mask_ref (bn, 1, bk) float 1/0 for key-padding masks or (bn, bq, bk)
    for full masks (the add broadcasts either way);
    scratch: m/l (bn*nh, bq) f32, acc (bn*nh, bq, dh) f32 — carried across
    the innermost (key) grid dimension.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bn, nh, bq, dh = q_ref.shape
    bk = k_ref.shape[2]
    q = q_ref[:].reshape(bn * nh, bq, dh)
    k = k_ref[:].reshape(bn * nh, bk, dh)
    v = v_ref[:].reshape(bn * nh, bk, dh)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (bn*nh, bq, bk)
    add = ((1.0 - mask_ref[:].astype(jnp.float32))
           * -10000.0)[:, None, :, :]              # (bn, 1, 1|bq, bk)
    scores = (scores.reshape(bn, nh, bq, bk) * scale
              + add).reshape(bn * nh, bq, bk)

    m_prev = m_scr[:]                              # (bn*nh, bq)
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
    alpha = jnp.exp(m_prev - m_new)                # (bn*nh, bq)
    p = jnp.exp(scores - m_new[..., None])         # (bn*nh, bq, bk)

    m_scr[:] = m_new
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (bn*nh, bq, dh)
    acc_scr[:] = acc_scr[:] * alpha[..., None] + pv

    @pl.when(ik == nk - 1)
    def _write():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[:] = out.reshape(bn, nh, bq, dh).astype(o_ref.dtype)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, num_heads: int,
                    block_q: int = 128, block_k: int = 128) -> jnp.ndarray:
    """q (N, Lq, H), k/v (N, Lk, H), mask (N, Lq, Lk) or (N, 1, Lk).

    Returns (N, Lq, H).  No dropout (fast/inference path)."""
    n, lq, h = q.shape
    lk = k.shape[1]
    dh = h // num_heads
    scale = 1.0 / math.sqrt(dh)
    mask_1d = mask.shape[1] == 1

    sub = 16 if q.dtype == jnp.bfloat16 else 8
    bq = min(block_q, _round_up(lq, sub))
    bk = min(block_k, _round_up(max(lk, 128), 128))
    lq_p = _round_up(lq, bq)
    lk_p = _round_up(lk, bk)

    def pad(x, target, axis):
        cfgs = [(0, 0)] * x.ndim
        cfgs[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, cfgs)

    qh = pad(q.reshape(n, lq, num_heads, dh).transpose(0, 2, 1, 3), lq_p, 2)
    kh = pad(k.reshape(n, lk, num_heads, dh).transpose(0, 2, 1, 3), lk_p, 2)
    vh = pad(v.reshape(n, lk, num_heads, dh).transpose(0, 2, 1, 3), lk_p, 2)
    # padded keys carry mask 0 -> -1e4, harmless vs the running max as long
    # as a row has >= 1 visible key (svpc rows always do: [CLS]/[BOS]);
    # rows with ZERO visible keys produce (different) garbage in any
    # implementation.  Padded queries are discarded after the call.
    # sequences per grid cell: amortize DMA at small L within a VMEM
    # budget (double-buffered blocks + f32 scores/accumulator scratch)
    bytes_el = 2 if q.dtype == jnp.bfloat16 else 4
    bn = 1
    for cand in (8, 4, 2, 1):
        if n % cand:
            continue
        blocks = cand * num_heads * dh * (bq + 2 * bk) * bytes_el \
            + cand * (bq if not mask_1d else 1) * bk * 4
        # scores materializes ~3x in f32 on the Mosaic stack (scores, p,
        # and the dot operand copy) plus the accumulator scratch
        scratch = cand * num_heads * (3 * bq * bk + 2 * bq * dh + 4 * bq) * 4
        if 2 * blocks + scratch < 12_000_000:
            bn = cand
            break

    if mask_1d:
        mh = pad(mask, lk_p, 2)
        mask_spec = pl.BlockSpec((bn, 1, bk), lambda b, iq, ik: (b, 0, ik),
                                 memory_space=pltpu.VMEM)
    else:
        mh = pad(pad(jnp.broadcast_to(mask, (n, lq, lk)), lq_p, 1), lk_p, 2)
        mask_spec = pl.BlockSpec((bn, bq, bk), lambda b, iq, ik: (b, iq, ik),
                                 memory_space=pltpu.VMEM)

    grid = (n // bn, lq_p // bq, lk_p // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, num_heads, bq, dh),
                         lambda b, iq, ik: (b, 0, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, num_heads, bk, dh),
                         lambda b, iq, ik: (b, 0, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, num_heads, bk, dh),
                         lambda b, iq, ik: (b, 0, ik, 0),
                         memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec((bn, num_heads, bq, dh),
                               lambda b, iq, ik: (b, 0, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, num_heads, lq_p, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bn * num_heads, bq), jnp.float32),      # running max
            pltpu.VMEM((bn * num_heads, bq), jnp.float32),      # running sum
            pltpu.VMEM((bn * num_heads, bq, dh), jnp.float32),  # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * num_heads * lq_p * lk_p * dh,
            bytes_accessed=(qh.size + kh.size + vh.size + mh.size) * 2,
            transcendentals=n * num_heads * lq_p * lk_p,
        ),
    )(qh, kh, vh, mh)

    out = out[:, :, :lq, :]                       # drop query padding
    return out.transpose(0, 2, 1, 3).reshape(n, lq, h)
