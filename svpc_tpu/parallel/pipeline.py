"""GPipe-style pipeline parallelism over a stacked homogeneous trunk.

This implements the pipeline design documented in docs/DESIGN.md §5: cut a
stack of identical layers into ``pp`` contiguous stages laid out on a mesh
axis, run the microbatch schedule inside ``jax.shard_map`` with
``lax.ppermute`` moving activations stage-to-stage over ICI, and let
autodiff derive the reversed backward pipeline.  Because every loss in
this codebase is a SUM over examples, microbatching is mathematically
exact (same argument as gradient accumulation, tests/test_accum.py).

``cli.train --pp_size N`` routes the model's clip-encoder and decoder
trunks through this primitive (model/layers.py ``Encoder._pp_call`` /
``Decoder._pp_call``: params stacked per layer and sharded over pp,
activations microbatched with ``split_microbatches``, dropout keys
threaded per microbatch as raw key data).  Trajectory-identical to pp=1
— ``tests/test_pipeline.py`` proves output+gradient parity for the raw
primitive AND loss/grad/K-step parity through the real model and
``train()``; ``__graft_entry__.py`` trains a 4+4-layer variant under
dp×pp in the multichip dryrun.  Worth enabling only for deeper trunks:
at the flagship's 2+2 layers the bubble dominates (docs/DESIGN.md §5).

Schedule: plain GPipe (all microbatches forward per stage, backward by
transposition).  For ``n`` microbatches and ``pp`` stages the pipeline
runs ``n + pp - 1`` ticks; bubble fraction ``(pp-1)/(n+pp-1)``.  A 1F1B
variant only changes peak activation memory, not math — with
``jax.checkpoint`` around ``stage_fn`` the stored state per stage is the
layer inputs, which is the same footprint 1F1B targets.

Reference frame: the PyTorch reference is strictly single-GPU (SURVEY
§2.4); this subsystem exists because scaling is first-class here.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

Pytree = Any


def stack_layers(per_layer_params: list) -> Pytree:
    """``[p_0, .., p_{L-1}]`` -> one pytree with a leading layer axis.

    The leading axis is what ``gpipe`` shards over the pipeline mesh
    axis, giving each stage a contiguous block of ``L / pp`` layers.
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer_params)


def auto_microbatches(n: int, requested: int, dp: int, pp: int) -> int:
    """Microbatch count for a batch axis of ``n`` rows under dp shards.

    Every microbatch must take an equal slice of every dp shard
    (``split_microbatches``), so the count must divide ``n // dp``.
    ``requested`` <= 0 targets ``2 * pp`` (bubble fraction
    ``(pp-1)/(2pp+pp-1)`` ~ 1/3 at pp=2 without inflating activation
    memory); either way the result is clamped to the largest feasible
    divisor, never an error — shapes are static so this is a trace-time
    decision.
    """
    per = max(n // max(dp, 1), 1)
    want = requested if requested > 0 else 2 * pp
    k = max(1, min(want, per))
    while per % k:
        k -= 1
    return k


def split_microbatches(x: jnp.ndarray, n_micro: int, dp: int = 1
                       ) -> jnp.ndarray:
    """``(N, ...)`` -> ``(n_micro, N/n_micro, ...)`` such that microbatch
    ``i`` takes the i-th equal slice of EVERY dp shard of the batch axis —
    a shard-local reshape (no cross-shard data movement when the batch
    axis is dp-sharded).  ``merge_microbatches`` is the exact inverse."""
    N = x.shape[0]
    per = N // dp
    m = per // n_micro
    x = x.reshape((dp, n_micro, m) + x.shape[1:])
    x = jnp.swapaxes(x, 0, 1)
    return x.reshape((n_micro, dp * m) + x.shape[3:])


def merge_microbatches(x: jnp.ndarray, dp: int = 1) -> jnp.ndarray:
    """Inverse of :func:`split_microbatches`."""
    n_micro, bm = x.shape[:2]
    m = bm // dp
    x = x.reshape((n_micro, dp, m) + x.shape[2:])
    x = jnp.swapaxes(x, 0, 1)
    return x.reshape((dp * n_micro * m,) + x.shape[3:])


def gpipe(stage_fn: Callable[[Pytree, Pytree], Pytree],
          stacked_params: Pytree,
          microbatches: Pytree,
          mesh: Mesh,
          *,
          pp_axis: str = "pp",
          batch_axis: Optional[str] = None,
          mb_specs: Optional[Pytree] = None,
          remat: bool = False) -> Pytree:
    """Run ``microbatches`` through a layer stack pipelined over ``pp_axis``.

    Args:
      stage_fn: applies ONE layer: ``(layer_params, act) -> act`` where
        ``act`` is a pytree with the same structure/shapes in and out
        (e.g. ``(hidden, mask)`` — non-evolving members just pass
        through).  Must be jax-traceable.
      stacked_params: per-layer params stacked on a leading layer axis
        (see :func:`stack_layers`); the ``pp_axis`` mesh size must divide
        the layer count.
      microbatches: pytree of arrays with a leading microbatch axis; each
        ``microbatches[i]`` is one ``act`` for ``stage_fn``.  When
        ``batch_axis`` is given, the SECOND axis of every leaf is
        additionally sharded over that mesh axis (data parallelism
        composed with the pipeline).
      mesh: mesh carrying ``pp_axis`` (and optionally ``batch_axis``).
      mb_specs: optional per-leaf PartitionSpec pytree (same structure as
        ``microbatches``) overriding the uniform ``P(None, batch_axis)``
        layout — needed when some activation leaves are NOT batch-shaped
        (e.g. a per-microbatch dropout-key data leaf rides replicated as
        ``P(None)``).  Output leaves reuse the same specs.
      remat: wrap each layer application in ``jax.checkpoint`` so the
        backward pipeline rematerializes instead of storing every tick's
        intermediates (the 1F1B memory story, see module docstring).

    Returns:
      The pytree of outputs, same structure/shapes as ``microbatches``
      (replicated over ``pp_axis``; sharded over ``batch_axis`` if given).

    Differentiable in both ``stacked_params`` and ``microbatches``: the
    backward pass is the transposed pipeline (``ppermute`` reverses its
    permutation, the tick scan runs in reverse).
    """
    pp = mesh.shape[pp_axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % pp:
        raise ValueError(
            f"pp={pp} must divide the layer count ({n_layers})")
    n_micro = jax.tree_util.tree_leaves(microbatches)[0].shape[0]
    ticks = n_micro + pp - 1
    # stage i hands its activation to stage i+1; the wrap-around edge only
    # ever carries garbage (stage 0 overwrites its inbox with fresh input)
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    apply_one = jax.checkpoint(stage_fn) if remat else stage_fn

    def local_apply(params_local, act):
        def body(h, p):
            return apply_one(p, h), None
        out, _ = lax.scan(body, act, params_local)
        return out

    def shard_fn(params_local, mbs):
        stage = lax.axis_index(pp_axis)
        tmap = jax.tree_util.tree_map
        # the carries become device-varying over pp inside the loop (they
        # depend on axis_index), so mark the initial values varying too
        vary = lambda v: lax.pcast(v, pp_axis, to="varying")
        act = tmap(lambda m: vary(jnp.zeros_like(m[0])), mbs)
        out_buf = tmap(lambda m: vary(jnp.zeros_like(m)), mbs)

        def tick(carry, t):
            act, out_buf = carry
            # stage 0 ingests microbatch t (clamped once the feed drains;
            # those extra applications are discarded by the emit gate)
            i_in = jnp.minimum(t, n_micro - 1)
            inp = tmap(lambda m: lax.dynamic_index_in_dim(
                m, i_in, keepdims=False), mbs)
            act = tmap(lambda i, a: jnp.where(stage == 0, i, a), inp, act)
            y = local_apply(params_local, act)
            # the last stage emits finished microbatch t-(pp-1)
            emit = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            i_out = jnp.clip(t - (pp - 1), 0, n_micro - 1)

            def put(buf, v):
                old = lax.dynamic_index_in_dim(buf, i_out, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    buf, jnp.where(emit, v, old), i_out, 0)

            out_buf = tmap(put, out_buf, y)
            act = lax.ppermute(y, pp_axis, perm)
            return (act, out_buf), None

        (_, out_buf), _ = lax.scan(tick, (act, out_buf), jnp.arange(ticks))
        # only the last stage's buffer holds results; psum broadcasts it
        onlast = (stage == pp - 1)
        return tmap(lambda b: lax.psum(
            jnp.where(onlast, b, jnp.zeros_like(b)), pp_axis), out_buf)

    tmap = jax.tree_util.tree_map
    if mb_specs is None:
        mb_spec = P(None, batch_axis) if batch_axis else P()
        mb_specs = tmap(lambda _: mb_spec, microbatches)
    in_specs = (tmap(lambda _: P(pp_axis), stacked_params), mb_specs)
    out_specs = mb_specs
    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=in_specs, out_specs=out_specs)
    return fn(stacked_params, microbatches)


def encoder_stage_fn(cfg) -> Callable:
    """``stage_fn`` driving the model's own :class:`EncoderLayer`.

    Activation pytree is ``(hidden (B, L, H), mask (B, L))``; the mask
    rides along unchanged.  With this, a deep homogeneous encoder trunk
    (``cfg.num_hidden_layers`` large) pipelines without touching the
    layer code at all.
    """
    from svpc_tpu.model.layers import EncoderLayer
    layer = EncoderLayer(cfg)

    def fn(p, act):
        x, mask = act
        return layer.apply({"params": p}, x, mask), mask

    return fn


def init_stacked_encoder(cfg, rng, n_layers: int, batch_shape) -> Pytree:
    """Init ``n_layers`` independent EncoderLayer params, stacked."""
    from svpc_tpu.model.layers import EncoderLayer
    layer = EncoderLayer(cfg)
    B, L = batch_shape
    x = jnp.zeros((B, L, cfg.hidden_size))
    mask = jnp.ones((B, L))
    params = [layer.init(k, x, mask)["params"]
              for k in jax.random.split(rng, n_layers)]
    return stack_layers(params)
