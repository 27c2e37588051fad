"""Device prefetcher (data/prefetch.py): background producer protocol —
errors surface on the consumer side, and closing the generator stops the
producer thread instead of letting it prefetch (and hold device batches)
forever after an early break."""

import threading
import time

import numpy as np
import pytest


def _slow_batches(n, built, delay=0.0):
    for i in range(n):
        if delay:
            time.sleep(delay)
        built.append(i)
        yield {"x": np.full((2, 2), i, np.float32)}, [{"i": i}]


def test_prefetch_yields_all_and_preserves_order():
    from svpc_tpu.data.prefetch import prefetch_to_device

    built = []
    out = list(prefetch_to_device(_slow_batches(5, built), size=2))
    assert [m[0]["i"] for _, m in out] == list(range(5))
    assert [int(np.asarray(b["x"])[0, 0]) for b, _ in out] == list(range(5))
    assert built == list(range(5))


def test_prefetch_close_stops_producer_after_break():
    from svpc_tpu.data.prefetch import prefetch_to_device

    built = []
    before = {t.ident for t in threading.enumerate()}
    it = prefetch_to_device(_slow_batches(100, built, delay=0.01), size=2)
    next(it)          # consume one batch, then break out like the loop does
    it.close()        # train/loop.py closes deterministically at epoch end
    # the producer thread must exit promptly (not run through all 100)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer still alive: {extra}"
    # it stopped early: at most the queue depth + one in-flight got built
    assert len(built) <= 5, built


def test_prefetch_propagates_producer_error():
    from svpc_tpu.data.prefetch import prefetch_to_device

    def bad():
        yield {"x": np.zeros((1,), np.float32)}, [{}]
        raise RuntimeError("boom in the host pipeline")

    it = prefetch_to_device(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
