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


def transient_retry(fn, attempts: int = 3, what: str = "step"):
    """Wrap a jitted callable so transport/compile-phase RPC flakes are
    retried with backoff instead of killing a multi-hour run.

    If a retry trips over inputs the failed attempt already donated, the
    'Array has been deleted' error is chained with resume advice — the
    run's checkpoint_last is the recovery point in that case."""

    def wrapped(*args, **kwargs):
        last = None
        for attempt in range(attempts):
            try:
                return fn(*args, **kwargs)
            # RuntimeError, not jax.errors.JaxRuntimeError: the
            # deleted-donated-array error a retry trips over is a plain
            # RuntimeError (JaxRuntimeError subclasses it, so transport
            # flakes are still caught here too)
            except RuntimeError as e:
                msg = str(e)
                if last is not None and "deleted" in msg.lower():
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
                logger.warning(
                    "transient runtime failure in %s (attempt %d/%d), "
                    "retrying: %s", what, attempt + 1, attempts,
                    msg.splitlines()[0] if msg else msg)
                time.sleep(2.0 * (attempt + 1))
        raise last  # pragma: no cover — loop always returns or raises

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
