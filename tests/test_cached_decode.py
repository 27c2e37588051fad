"""KV-cached incremental decoding must be exactly equal to the full
per-position recompute (which itself is token-for-token the reference)."""

import numpy as np
import pytest


@pytest.mark.parametrize("mode", ["video", "copy", "full"])
def test_cached_equals_uncached(mode):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.decode.greedy import greedy_decode
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config(mode)
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, seed=4).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    uncached = np.asarray(greedy_decode(model, params, batch, use_cache=False))
    cached = np.asarray(greedy_decode(model, params, batch, use_cache=True))
    np.testing.assert_array_equal(cached, uncached)
