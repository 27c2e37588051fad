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


def test_flash_multiblock_streaming_matches_xla():
    """Force multiple key/query blocks so the running-max/sum streaming
    softmax path is exercised (not just a single-block reduction)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from svpc_tpu.model.layers import attention_core
    from svpc_tpu.ops import pallas_attention

    rng = np.random.RandomState(1)
    N, L, H, nh = 2, 300, 32, 4
    q = rng.randn(N, L, H).astype(np.float32)
    k = rng.randn(N, L, H).astype(np.float32)
    v = rng.randn(N, L, H).astype(np.float32)
    mask = (rng.rand(N, 1, L) > 0.3).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = pallas_attention.fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), nh, block_q=128, block_k=128)
    ref = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.broadcast_to(jnp.asarray(mask), (N, L, L)),
        num_heads=nh, dropout_rate=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_full_mask_causal_matches_xla():
    """The blocked 2D-mask path (causal masking) must match XLA."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from svpc_tpu.model.layers import attention_core
    from svpc_tpu.ops import pallas_attention

    rng = np.random.RandomState(2)
    N, L, H, nh = 2, 160, 32, 4
    q = rng.randn(N, L, H).astype(np.float32)
    k = rng.randn(N, L, H).astype(np.float32)
    v = rng.randn(N, L, H).astype(np.float32)
    pad = (rng.rand(N, 1, L) > 0.2).astype(np.float32)
    pad[:, :, 0] = 1.0  # keep every causal row non-degenerate: a row with
    # ZERO visible keys is garbage in both implementations but different
    # garbage (flash's padded key columns compete with real masked keys
    # only when everything is -1e4); svpc never queries such rows
    causal = np.tril(np.ones((L, L), np.float32))[None]
    mask = pad * causal                                # (N, L, L)

    with pltpu.force_tpu_interpret_mode():
        got = pallas_attention.fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), nh, block_q=64, block_k=128)
    ref = attention_core(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        num_heads=nh, dropout_rate=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
