"""BiLSTM parity with torch.nn.LSTM, including step masking."""

import numpy as np
import pytest


def test_bilstm_matches_torch():
    import torch
    import jax
    import jax.numpy as jnp
    from svpc_tpu.model.lstm import BiLSTM

    rng = np.random.RandomState(0)
    B, S, D, H = 3, 7, 5, 6
    x = rng.randn(B, S, D).astype(np.float32)

    torch.manual_seed(0)
    ref = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    ref_out = ref_out.numpy()

    model = BiLSTM(H)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": {
        "w_ih_fwd": sd["weight_ih_l0"], "w_hh_fwd": sd["weight_hh_l0"],
        "b_ih_fwd": sd["bias_ih_l0"], "b_hh_fwd": sd["bias_hh_l0"],
        "w_ih_bwd": sd["weight_ih_l0_reverse"],
        "w_hh_bwd": sd["weight_hh_l0_reverse"],
        "b_ih_bwd": sd["bias_ih_l0_reverse"],
        "b_hh_bwd": sd["bias_hh_l0_reverse"],
    }}
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)

    # masking: a padded tail must not change the valid prefix's outputs
    n_valid = 4
    mask = np.zeros((B, S), np.float32)
    mask[:, :n_valid] = 1
    with torch.no_grad():
        ref_short, _ = ref(torch.from_numpy(x[:, :n_valid]))
    got_masked = np.asarray(model.apply(params, jnp.asarray(x),
                                        jnp.asarray(mask)))
    np.testing.assert_allclose(got_masked[:, :n_valid],
                               ref_short.numpy(), rtol=1e-5, atol=1e-6)
    assert np.abs(got_masked[:, n_valid:]).max() == 0.0
