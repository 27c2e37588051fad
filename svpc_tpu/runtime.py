"""Runtime initialization helpers shared by all CLIs."""

from __future__ import annotations

import os


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
