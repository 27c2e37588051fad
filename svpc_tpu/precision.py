"""Numerics policy.

``compute_dtype == "float32"`` is the *parity* path: matmuls run at
"highest" precision (exact f32 — on TPU MXU this is the 6-pass bf16x6
scheme), reproducing the PyTorch reference bit-for-bit at argmax
granularity.  ``bfloat16`` is the fast path: default TPU precision, bf16
matmuls on the MXU.
"""

from __future__ import annotations

import contextlib

import jax

from svpc_tpu.config import ModelConfig


def matmul_precision_for(cfg: ModelConfig) -> str:
    return "highest" if cfg.compute_dtype == "float32" else "default"


@contextlib.contextmanager
def precision_scope(cfg: ModelConfig):
    """Set the default matmul precision for everything traced inside."""
    with jax.default_matmul_precision(matmul_precision_for(cfg)):
        yield
