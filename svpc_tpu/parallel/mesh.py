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

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(dp_size: Optional[int] = None, tp_size: int = 1,
              pp_size: int = 1, devices=None) -> Mesh:
    """dp×tp mesh, or dp×pp when ``pp_size > 1`` (pp innermost so
    pipeline-neighbor ``ppermute`` hops ride adjacent ICI links)."""
    devices = devices if devices is not None else jax.devices()
    if dp_size is None:
        dp_size = max(len(devices) // (tp_size * pp_size), 1)
    n = dp_size * tp_size * pp_size
    if n > len(devices):
        raise ValueError(
            f"mesh {dp_size}x{tp_size}x{pp_size} needs {n} devices, "
            f"have {len(devices)}")
    if pp_size > 1:
        if tp_size > 1:
            raise NotImplementedError(
                "tp × pp composition is not implemented; use dp × pp "
                "(TrainConfig.pp_size) or dp × tp (tp_size)")
        arr = np.array(devices[:n]).reshape(dp_size, pp_size)
        return Mesh(arr, ("dp", "pp"))
    arr = np.array(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a K-stacked multi-step batch (K, B, ...): the scan
    axis replicates, the batch axis (dim 1) shards over dp."""
    return NamedSharding(mesh, P(None, "dp"))


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
    identical numerics to the single-host run by construction."""
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: _assemble_from_index_map(sharding, v)
            for k, v in batch.items()}


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
    """
    keys = [p.key for p in path if hasattr(p, "key")]
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


def zero1_partition_spec(path: tuple, shape: tuple, dp: int, tp: int,
                         has_tp: bool = True) -> P:
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

    The leaf keeps its parameter's TP layout and folds ``dp`` into the
    first free, divisible dimension; leaves with no divisible dimension
    replicate over dp (scalars, tiny biases).
    """
    # on a mesh without a tp axis (dp×pp) the TP layout degenerates to
    # replication and only the dp fold below applies
    base = param_partition_spec(path) if has_tp else P()
    spec = list(base) + [None] * (len(shape) - len(base))
    for d, ax in enumerate(spec):
        # mirror shard_params' TP divisibility fallback
        if ax is not None and shape[d] % tp != 0:
            spec = [None] * len(shape)
            break
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
    dp sharding (params keep their existing TP/replicated placement).

    Use with a pinned ``out_shardings`` on the jitted train step so the
    sharded layout persists across steps and donation stays effective
    (train/loop.py)."""
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    has_tp = "tp" in mesh.shape

    def place(path, x):
        spec = zero1_partition_spec(path, tuple(getattr(x, "shape", ())),
                                    dp, tp, has_tp=has_tp)
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


def shard_params(mesh: Mesh, params: Any, report: Optional[dict] = None) -> Any:
    """Place a param pytree with TP partition specs over the mesh.

    A spec only applies when the sharded dimension divides the axis size;
    otherwise the leaf replicates (and is recorded in ``report`` when
    given, mapping path -> "replicated(shape)").  With
    ``ModelConfig.vocab_pad_multiple = tp`` no vocab rule hits this
    fallback; it exists for ad-hoc geometries."""
    tp = mesh.shape.get("tp", 1)

    def place(path, x):
        spec = param_partition_spec(path)
        if "tp" not in mesh.shape and spec != P():
            # dp×pp mesh: no tp axis — params replicate (every rule in
            # param_partition_spec is a TP rule)
            spec = P()
        for dim, axis in enumerate(spec):
            if axis is not None and x.shape[dim] % tp != 0:
                if report is not None:
                    key = "/".join(p.key for p in path if hasattr(p, "key"))
                    report[key] = f"replicated{tuple(x.shape)}"
                spec = P()
                break
        else:
            if report is not None and spec != P():
                key = "/".join(p.key for p in path if hasattr(p, "key"))
                report[key] = str(spec)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
