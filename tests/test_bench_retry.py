"""bench.py phase-retry semantics.

The round-end bench artifact must survive one transient TPU-tunnel RPC
flake (runtime.py catalogues the markers) and must not retry on real
errors.  These tests exercise _measure_with_retry directly — no jax, no
device.
"""

import importlib.util
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("svpc_bench", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["svpc_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


def test_retries_on_transient_marker(bench, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = []

    def phase(x):
        calls.append(x)
        if len(calls) < 3:
            raise RuntimeError("INTERNAL: remote_compile: read body: "
                               "response body closed")
        return 42.0

    assert bench._measure_with_retry(phase, 7, what="t") == 42.0
    assert calls == [7, 7, 7]  # phase re-ran from scratch each attempt


def test_raises_immediately_on_real_error(bench):
    calls = []

    def phase():
        calls.append(1)
        raise RuntimeError("shape mismatch (8, 3) vs (8, 4)")

    with pytest.raises(RuntimeError, match="shape mismatch"):
        bench._measure_with_retry(phase, what="t")
    assert len(calls) == 1  # no retry on a non-transient failure


def test_exhausted_retries_reraise(bench, monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    calls = []

    def phase():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: tunnel down")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._measure_with_retry(phase, attempts=3, what="t")
    assert len(calls) == 3


def test_non_runtime_errors_propagate(bench):
    def phase():
        raise ValueError("bad config")  # not a transport failure

    with pytest.raises(ValueError):
        bench._measure_with_retry(phase, what="t")
