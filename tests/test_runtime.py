"""transient_retry (svpc_tpu/runtime.py): the TPU-tunnel RPC layer can
fail a mid-epoch recompile (observed: 'INTERNAL: .../remote_compile:
read body: response body closed'); jitted steps reissue those instead of
killing a long run, and everything else still raises immediately."""

import pytest


def _jax_err(msg):
    import jax
    return jax.errors.JaxRuntimeError(msg)


def test_retries_transient_then_succeeds(monkeypatch):
    from svpc_tpu import runtime

    monkeypatch.setattr(runtime.time, "sleep", lambda s: None)
    calls = []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise _jax_err("INTERNAL: http://127.0.0.1:8083/remote_compile"
                           ": read body: response body closed")
        return x + 1

    assert runtime.transient_retry(flaky, attempts=3)(41) == 42
    assert len(calls) == 3


def test_non_transient_raises_immediately(monkeypatch):
    from svpc_tpu import runtime

    monkeypatch.setattr(runtime.time, "sleep", lambda s: None)
    calls = []

    def broken(x):
        calls.append(x)
        raise _jax_err("INVALID_ARGUMENT: shapes do not match")

    with pytest.raises(Exception, match="shapes do not match"):
        runtime.transient_retry(broken, attempts=3)(0)
    assert len(calls) == 1


def test_exhausted_attempts_reraise(monkeypatch):
    from svpc_tpu import runtime

    monkeypatch.setattr(runtime.time, "sleep", lambda s: None)
    calls = []

    def always_flaky(x):
        calls.append(x)
        raise _jax_err("UNAVAILABLE: connection reset by peer")

    with pytest.raises(Exception, match="UNAVAILABLE"):
        runtime.transient_retry(always_flaky, attempts=3)(0)
    assert len(calls) == 3


def test_donated_inputs_after_transient_chain_resume_advice(monkeypatch):
    """If the failed attempt already consumed donated buffers, the retry
    hits 'Array has been deleted' — that must surface resume advice
    chained to the ORIGINAL transient failure, not a bare buffer error."""
    from svpc_tpu import runtime

    monkeypatch.setattr(runtime.time, "sleep", lambda s: None)
    calls = []

    def donated(x):
        calls.append(x)
        if len(calls) == 1:
            raise _jax_err("INTERNAL: remote_compile: read body")
        # jax raises the deleted-donated-array error as a PLAIN
        # RuntimeError (NOT JaxRuntimeError — verified on jax 0.9.0), so
        # this test must model that exact type or it masks a dead branch
        raise RuntimeError("Array has been deleted with shape=float32[8]")

    with pytest.raises(RuntimeError, match="resume_from") as e:
        runtime.transient_retry(donated, attempts=3, what="train step")(0)
    assert "remote_compile" in str(e.value.__cause__)


def test_ordinary_python_errors_untouched():
    from svpc_tpu import runtime

    def boom(x):
        raise ValueError("not a runtime error")

    with pytest.raises(ValueError):
        runtime.transient_retry(boom)(0)
