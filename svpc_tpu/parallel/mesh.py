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
