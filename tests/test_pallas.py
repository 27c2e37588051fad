"""Pallas fused-attention kernel vs the XLA attention core.

Runs in interpreter mode on CPU (so CI covers it) and compiled on TPU.
Note: at svpc geometry (<=128 tokens) XLA's fused attention is ~2x faster
than this kernel on v5e, so ``use_pallas`` defaults to False — the kernel
is kept for larger-sequence configurations and as the Mosaic on-ramp.
"""

import numpy as np
import pytest


def test_fused_attention_matches_xla_interpret(monkeypatch):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from svpc_tpu.model.layers import attention_core
    from svpc_tpu.ops import pallas_attention

    rng = np.random.RandomState(0)
    N, L, H, nh = 4, 20, 32, 4
    q = rng.randn(N, L, H).astype(np.float32)
    k = rng.randn(N, L, H).astype(np.float32)
    v = rng.randn(N, L, H).astype(np.float32)
    mask = (rng.rand(N, 1, L) > 0.3).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = pallas_attention.fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), nh)
    ref = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.broadcast_to(jnp.asarray(mask), (N, L, L)),
        num_heads=nh, dropout_rate=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
