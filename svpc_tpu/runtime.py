"""Runtime initialization helpers shared by all CLIs."""

from __future__ import annotations

import logging
import os
import time

logger = logging.getLogger(__name__)

# Failure signatures of the TPU-tunnel RPC layer (observed on the axon
# platform: a mid-epoch recompile died with "INTERNAL: http://127.0.0.1:
# 8083/remote_compile: read body: response body closed before all bytes
# were read").  These happen before the computation executes, so the call
# is safe to reissue; anything else re-raises immediately.
_TRANSIENT_MARKERS = ("remote_compile", "read body", "connection reset",
                      "deadline_exceeded", "deadline exceeded",
                      "unavailable")  # matched against msg.lower()


def run_with_transient_retry(call, attempts: int = 3, what: str = "step",
                             log=None, donated_hint: bool = False):
    """Invoke ``call()`` retrying transport/compile-phase RPC flakes with
    backoff — the ONE retry core behind both ``transient_retry`` (jitted
    calls; pass ``donated_hint=True``) and bench.py's phase-level retry
    (fresh state per attempt, custom ``log``), so their semantics can't
    drift (round-2 advisor finding).

    ``log(message)`` reports each retry (default: this module's logger).
    ``donated_hint`` chains the 'Array has been deleted' error a retry can
    trip over (inputs the failed attempt already donated) with resume
    advice — checkpoint_last is the recovery point there."""
    report = log or (lambda m: logger.warning("%s", m))
    last = None
    for attempt in range(attempts):
        try:
            return call()
        # RuntimeError, not jax.errors.JaxRuntimeError: the
        # deleted-donated-array error a retry trips over is a plain
        # RuntimeError (JaxRuntimeError subclasses it, so transport
        # flakes are still caught here too)
        except RuntimeError as e:
            msg = str(e)
            if donated_hint and last is not None and "deleted" in msg.lower():
                raise RuntimeError(
                    f"the failed {what} had already consumed its "
                    "donated inputs — resume from the last checkpoint "
                    "(--resume_from <workdir>/checkpoint_last)"
                ) from last
            if (attempt == attempts - 1
                    or not any(m in msg.lower()
                               for m in _TRANSIENT_MARKERS)):
                raise
            last = e
            first = (msg.splitlines() or [""])[0][:200]
            report(f"transient runtime failure in {what} "
                   f"(attempt {attempt + 1}/{attempts}), retrying: {first}")
            time.sleep(2.0 * (attempt + 1))
    raise last  # pragma: no cover — loop always returns or raises


def transient_retry(fn, attempts: int = 3, what: str = "step"):
    """Wrap a jitted callable so transport/compile-phase RPC flakes are
    retried with backoff instead of killing a multi-hour run.

    If a retry trips over inputs the failed attempt already donated, the
    'Array has been deleted' error is chained with resume advice — the
    run's checkpoint_last is the recovery point in that case."""

    def wrapped(*args, **kwargs):
        return run_with_transient_retry(
            lambda: fn(*args, **kwargs), attempts=attempts, what=what,
            donated_hint=True)

    return wrapped


def enable_compilation_cache(path: str = "") -> None:
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    (20-40s on TPU) first-compile cost."""
    import jax
    cache_dir = path or os.environ.get(
        "SVPC_COMPILE_CACHE", os.path.expanduser("~/.cache/svpc_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def init_runtime() -> None:
    enable_compilation_cache()
