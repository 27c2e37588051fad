"""Device mesh + sharding rules.

The reference is strictly single-process/single-GPU (SURVEY §2.4: zero
distributed code).  Here scaling is first-class and TPU-native: a
``jax.sharding.Mesh`` with a data-parallel ``dp`` axis (and a reserved
``tp`` axis for tensor parallelism), batches sharded along ``dp``, params
replicated, and XLA inserting the ICI collectives under ``jit``.  Because
every loss is a SUM over examples, data-parallel gradients are bitwise the
same math as the reference's single-device run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(dp_size: Optional[int] = None, tp_size: int = 1,
              pp_size: int = 1, devices=None) -> Mesh:
    """dp×tp mesh, dp×pp when only ``pp_size > 1``, or the full 3-axis
    dp×pp×tp mesh when both tp and pp exceed 1.

    Axis order is communication locality: tp innermost (the most
    bandwidth-hungry collectives — per-matmul all-reduces — ride adjacent
    ICI links), pipeline-neighbor ``ppermute`` hops next, dp outermost
    (one gradient psum per step tolerates the longest paths)."""
    devices = devices if devices is not None else jax.devices()
    if dp_size is None:
        dp_size = max(len(devices) // (tp_size * pp_size), 1)
    n = dp_size * tp_size * pp_size
    if n > len(devices):
        raise ValueError(
            f"mesh {dp_size}x{tp_size}x{pp_size} needs {n} devices, "
            f"have {len(devices)}")
    if pp_size > 1 and tp_size > 1:
        arr = np.array(devices[:n]).reshape(dp_size, pp_size, tp_size)
        return Mesh(arr, ("dp", "pp", "tp"))
    if pp_size > 1:
        arr = np.array(devices[:n]).reshape(dp_size, pp_size)
        return Mesh(arr, ("dp", "pp"))
    arr = np.array(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def stacked_batch_sharding(mesh: Mesh, n_leading: int = 1) -> NamedSharding:
    """Sharding for a stacked multi-step batch with ``n_leading`` scan
    axes — (K, B, ...) or, composed with gradient accumulation,
    (K, A, B, ...): the scan axes replicate, the batch axis shards
    over dp."""
    return NamedSharding(mesh, P(*([None] * n_leading), "dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Host batch -> device arrays sharded along dp.

    The global batch size must divide the dp axis; callers pad batches to a
    fixed size (data/pipeline.pad_batch_to), so this holds by construction.
    """
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)


def _assemble_from_index_map(sharding: NamedSharding, v) -> jax.Array:
    """Place one host-built GLOBAL array onto a (possibly multi-process)
    sharding by the sharding's own index map: each process device_puts
    exactly the slices its addressable devices own and the global array
    is assembled from those single-device shards.  Row selection is by
    index, so no device-order / contiguity assumption is made — correct
    for any mesh layout, including dp dims that are not axis 0
    (stacked (K, B, ...) batches) and tp-replicated rows."""
    imap = sharding.addressable_devices_indices_map(v.shape)
    shards = [jax.device_put(v[idx], d) for d, idx in imap.items()]
    return jax.make_array_from_single_device_arrays(v.shape, sharding, shards)


def assemble_global_batch(sharding: NamedSharding, batch: dict) -> dict:
    """Host-built GLOBAL batch -> sharded device arrays, multi-process
    safe.  Every process must build the IDENTICAL global batch (the
    pipeline's shuffle is deterministic in (seed, epoch), so it does);
    each process then transfers only the shards its own devices hold.
    Single-process reduces to plain device_put.

    Note the deliberate trade: hosts duplicate batch-construction work
    (each builds all examples, transfers 1/process_count of them) in
    exchange for exactness — no per-host dataset partitioning protocol,
    identical numerics to the single-host run by construction.  The
    opt-in sharded mode removes the duplication: with
    ``cli.train --multihost_sharded_data`` each process builds only the
    blocks its own devices hold (``local_dp_shards`` +
    ``pack_examples(only_shards=...)``); the host arrays then carry
    real data ONLY in the locally-owned regions, which are exactly the
    regions this function reads — identical device bytes either way
    (tests/test_sharded_data.py)."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: _assemble_from_index_map(sharding, v)
            for k, v in batch.items()}


def local_dp_shards(mesh: Mesh) -> set:
    """dp-shard indices whose batch rows land on THIS process's devices.

    Feeds the per-host sharded data-construction mode (SURVEY §2.4
    "per-host data loading"): ``data/packing.pack_examples(...,
    only_shards=local_dp_shards(mesh))`` builds only the blocks whose
    rows ``assemble_global_batch`` will actually transfer from this
    process, cutting per-process host work ~process_count-fold.  Derived
    from the batch sharding's own index map over a 1-row-per-shard
    global shape, so it can never drift from the placement.  On a single
    process this is all shards (the mode degenerates to the exact global
    build)."""
    dp = mesh.shape.get("dp", 1)
    imap = batch_sharding(mesh).addressable_devices_indices_map((dp,))
    owned = set()
    for idx in imap.values():
        sl = idx[0] if isinstance(idx, tuple) else idx
        owned.update(range(*sl.indices(dp)))
    return owned


def shard_batch_multihost(mesh: Mesh, global_batch: dict) -> dict:
    """Multi-host data-parallel batch placement: every process passes the
    same deterministically-built GLOBAL batch; only the shards owned by
    this process's devices are transferred (assemble_global_batch).  On a
    single process this reduces to shard_batch.

    Use with ``jax.distributed.initialize()`` on multi-host slices."""
    return assemble_global_batch(batch_sharding(mesh), global_batch)


# ---------------------------------------------------------------------- #
# tensor parallelism
# ---------------------------------------------------------------------- #

def param_partition_spec(path: tuple) -> P:
    """Sharding rule for one parameter, by tree path (Megatron layout).

    The model is small (42M params), so TP is about a real multi-axis
    layout rather than memory need.  At the paper config (hidden 768,
    12 heads) with ``ModelConfig.vocab_pad_multiple=tp`` every rule below
    actually fires at tp=2:

      * attention Q/K/V kernels column-sharded = head-wise (12 % 2 == 0;
        the (N,L,heads,dh) reshape keeps whole heads per shard), their
        biases sharded to match, and the attention output projection
        row-sharded (XLA inserts the psum);
      * FFN intermediate column-sharded (+bias), output row-sharded;
      * word/action embedding tables (V_pad, D) row-sharded over vocab;
      * LM head projection (H, V_pad) + bias column-sharded over vocab.

    Everything else (LayerNorms, LSTM, reasoner projections) replicates.
    XLA inserts the ICI collectives under jit.

    A ``layers`` path component marks the pipeline-RESIDENT stacked trunk
    layout (parallel/pipeline.stack_trunk_params): the leading layer axis
    shards over ``pp`` — each stage group stores only its own layer
    block — and the remaining dims carry the TP rule of the underlying
    parameter, shifted one dim right.
    """
    keys = [p.key for p in path if hasattr(p, "key")]
    if "layers" in keys:
        base = _tp_rule(keys[keys.index("layers") + 1:])
        return P("pp", *base)
    return _tp_rule(keys)


def _tp_rule(keys) -> P:
    name = keys[-1] if keys else ""
    parent = keys[-2] if len(keys) > 1 else ""
    joined = "/".join(keys)
    # attention: Q/K/V projections head-wise (columns), output rows
    if parent in ("query", "key", "value"):
        return P(None, "tp") if name == "kernel" else P("tp")
    if "attention/output/dense" in joined:
        return P("tp", None) if name == "kernel" else P()
    # vocab-dimension sharding: word/action embedding tables (V, D)
    if name in ("embedding", "action_embeddings"):
        return P("tp", None)
    # LM head projection (H, V) + bias (V,): shard the vocab dim
    if "decoder_classifier" in joined:
        if name == "kernel" and parent == "decoder":
            return P(None, "tp")
        if name == "bias" and parent == "decoder_classifier":
            return P("tp")
    # FFN: intermediate kernel column-sharded (+bias), output row-sharded
    if "intermediate/dense" in joined.replace("//", "/"):
        return P(None, "tp") if name == "kernel" else P("tp")
    if joined.endswith("output/dense/kernel") and "attention" not in joined:
        return P("tp", None)
    return P()


def zero1_partition_spec(path: tuple, shape: tuple,
                         axis_sizes: Dict[str, int]) -> P:
    """Sharding rule for one optimizer-moment / EMA-shadow leaf (ZeRO-1).

    The reference has no distributed optimizer at all (SURVEY §2.4).  Here
    the Adam moments and the EMA shadow — the dominant per-device state
    beyond the params — can shard over the ``dp`` axis: gradients stay
    replicated (the dp ``psum``), so the per-leaf and global grad-norm
    clips see full gradients and the elementwise moment/update math on
    each dp shard is bit-identical to the replicated run; XLA all-gathers
    only the final parameter *updates*.  Per-device moment+EMA memory
    drops ~dp-fold while the numerics are unchanged
    (tests/test_zero1.py).

    The leaf keeps its parameter's layout — TP rules AND, for
    pipeline-resident stacked trunks, the leading ``pp`` layer axis
    (so zero1 composes with ``--pp_size``: a stage's moments live only
    on that stage's dp group) — and folds ``dp`` into the first free,
    divisible dimension (or onto a ``tp`` dim divisible by dp*tp);
    leaves with no divisible dimension replicate over dp (scalars, tiny
    biases).  ``axis_sizes`` is the mesh's axis-name -> size mapping.
    """
    dp = axis_sizes.get("dp", 1)
    tp = axis_sizes.get("tp", 1)
    base = _resolve_spec(param_partition_spec(path), shape, axis_sizes)
    spec = list(base) + [None] * (len(shape) - len(base))
    for d in range(len(shape)):
        if spec[d] is None and shape[d] > 0 and shape[d] % dp == 0:
            spec[d] = "dp"
            break
        if spec[d] == "tp" and shape[d] % (dp * tp) == 0:
            spec[d] = ("tp", "dp")
            break
    return P(*spec)


def shard_state_zero1(mesh: Mesh, state: Any) -> Any:
    """Re-place a TrainState's optimizer state + EMA shadow with ZeRO-1
    dp sharding (params keep their existing TP/pp/replicated placement).

    Use with a pinned ``out_shardings`` on the jitted train step so the
    sharded layout persists across steps and donation stays effective
    (train/loop.py)."""
    axis_sizes = dict(mesh.shape)

    def place(path, x):
        spec = zero1_partition_spec(path, tuple(getattr(x, "shape", ())),
                                    axis_sizes)
        return jax.device_put(x, NamedSharding(mesh, spec))

    opt = jax.tree_util.tree_map_with_path(place, state.opt_state)
    shadow = state.ema_shadow
    if shadow is not None:
        shadow = jax.tree_util.tree_map_with_path(place, shadow)
    # step/epoch counters replicate on the SAME mesh so the whole state's
    # shardings are mesh-consistent (state_shardings feeds out_shardings)
    rep = replicated_sharding(mesh)
    return state.replace(opt_state=opt, ema_shadow=shadow,
                         step=jax.device_put(state.step, rep),
                         epoch=jax.device_put(state.epoch, rep))


def state_shardings(state: Any) -> Any:
    """Pytree of each leaf's current NamedSharding — pass as jit
    ``out_shardings`` to pin the (ZeRO-1) layout across steps."""
    return jax.tree.map(lambda x: x.sharding, state)


def _resolve_spec(spec: P, shape: tuple, axis_sizes: Dict[str, int]) -> P:
    """Drop spec axes the mesh does not carry, then verify divisibility:
    a TP dim that does not divide its axis demotes the WHOLE leaf's tp
    sharding to replication (mirroring the historical all-or-nothing
    fallback).  The pp layer axis survives the demotion independently —
    but only when it is itself divisible: ``train()`` guarantees
    pp | num_hidden_layers on its own trees, yet these helpers are public
    and callable on ad-hoc stacked leaves, where keeping a non-divisible
    pp dim would emit an invalid sharding that fails deep inside
    device_put (round-4 ADVICE)."""
    dims = [ax if ax in axis_sizes else None for ax in spec]
    dims += [None] * (len(shape) - len(dims))
    for d, ax in enumerate(dims):
        if ax is not None and shape[d] % axis_sizes[ax] != 0:
            dims = [a if (a == "pp" and shape[i] % axis_sizes["pp"] == 0)
                    else None for i, a in enumerate(dims)]
            break
    return P(*dims)


def shard_params(mesh: Mesh, params: Any, report: Optional[dict] = None) -> Any:
    """Place a param pytree with its partition specs over the mesh: TP
    rules (Megatron layout), plus the leading-``pp`` layer axis for
    pipeline-resident stacked trunks (param_partition_spec).

    A TP spec only applies when the sharded dimension divides the axis
    size; otherwise the leaf's tp sharding falls back to replication (and
    is recorded in ``report`` when given).  With
    ``ModelConfig.vocab_pad_multiple = tp`` no vocab rule hits this
    fallback; it exists for ad-hoc geometries."""
    axis_sizes = dict(mesh.shape)

    def place(path, x):
        rule = param_partition_spec(path)
        spec = _resolve_spec(rule, tuple(getattr(x, "shape", ())),
                             axis_sizes)
        if report is not None:
            # report only leaves a rule targeted: the applied spec, or
            # "replicated" when a mesh-present axis failed divisibility
            key = "/".join(p.key for p in path if hasattr(p, "key"))
            if spec != P():
                report[key] = str(spec)
            elif any(ax is not None and ax in axis_sizes for ax in rule):
                report[key] = f"replicated{tuple(x.shape)}"
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
