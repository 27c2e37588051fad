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
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp_size is None:
        dp_size = max(len(devices) // tp_size, 1)
    n = dp_size * tp_size
    if n > len(devices):
        raise ValueError(
            f"mesh {dp_size}x{tp_size} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


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


def shard_batch_multihost(mesh: Mesh, local_batch: dict) -> dict:
    """Multi-host data-parallel batch assembly: each process feeds its
    process-local shard of the global batch (per-host data loading as in
    SURVEY §2.4's plan).  On a single process this reduces to shard_batch.

    Use with ``jax.distributed.initialize()`` on multi-host slices; each
    host loads ``global_batch_size / process_count`` examples.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sh, v)
            for k, v in local_batch.items()}


# ---------------------------------------------------------------------- #
# tensor parallelism
# ---------------------------------------------------------------------- #

def param_partition_spec(path: tuple) -> P:
    """Sharding rule for one parameter, by tree path.

    The model is small (42M params), so TP is about demonstrating real
    multi-axis sharding rather than memory need: the widest matmuls —
    vocab-sized tables/heads and the FFN — shard over ``tp``; everything
    else replicates.  XLA inserts the ICI collectives.
    """
    keys = [p.key for p in path if hasattr(p, "key")]
    name = keys[-1] if keys else ""
    joined = "/".join(keys)
    # vocab-dimension sharding: word/action embedding tables (V, D)
    if name in ("embedding", "action_embeddings"):
        return P("tp", None)
    # LM head projection (H, V): shard the vocab dim
    if "decoder_classifier" in joined and name == "kernel" \
            and "decoder" in joined:
        return P(None, "tp")
    # FFN: intermediate kernel column-sharded, output kernel row-sharded
    if "intermediate/dense" in joined.replace("//", "/") and name == "kernel":
        return P(None, "tp")
    if joined.endswith("output/dense/kernel") and "attention" not in joined:
        return P("tp", None)
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree with TP partition specs over the mesh.

    A spec only applies when the sharded dimension divides the axis size
    (e.g. the 951-word vocab doesn't split over tp=2 — those tables
    replicate)."""
    tp = mesh.shape.get("tp", 1)

    def place(path, x):
        spec = param_partition_spec(path)
        for dim, axis in enumerate(spec):
            if axis is not None and x.shape[dim] % tp != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
