"""Background host pipeline: build + device-transfer batches ahead of the
training step (the reference's DataLoader workers default to 0 and every
example re-reads .npy files inline — SURVEY §2.4).

A small thread pool runs the (numpy/native-packer) batch construction and
eagerly issues ``jax.device_put`` so the accelerator never waits on the
host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

_SENTINEL = object()


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       sharding=None, transform=None) -> Iterator:
    """Wrap a (batch, meta) iterator: batches are built and transferred in
    a background thread, ``size`` ahead.  ``transform`` runs on the host
    batch before transfer (e.g. casting features to bf16, halving
    host→device traffic for the fast path)."""

    q: queue.Queue = queue.Queue(maxsize=size)
    err = []
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch, meta in iterator:
                if transform is not None:
                    batch = transform(batch)
                if sharding is not None:
                    # multi-process safe: every process builds the same
                    # deterministic global batch and transfers only the
                    # shards its devices own (parallel/mesh.py)
                    from svpc_tpu.parallel.mesh import assemble_global_batch
                    batch = assemble_global_batch(sharding, batch)
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                if not put((batch, meta)):
                    return
        except BaseException as e:  # surface errors on the consumer side
            err.append(e)
        finally:
            put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # unblock the producer if the consumer exits early
