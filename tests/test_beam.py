"""Beam search sanity: beam_size=1 must equal greedy exactly, and wider
beams must not decrease (and usually improve) total hypothesis score."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel

    cfg = tiny_test_config("full")
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 2, seed=1).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    return cfg, model, params, batch


def _hyp_logprob(model, params, batch, token_ids):
    """Sum log-prob of a decoded hypothesis under teacher forcing."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu import tokenization as tok
    cfg = model.cfg
    V = cfg.vocab_size
    state = model.apply(params, batch, deterministic=True,
                        method=type(model).encode)
    ids = jnp.asarray(token_ids)
    feed = jnp.where(ids >= V, tok.UNK, ids)
    B, S, T = ids.shape
    # mask: all positions up to and including first EOS
    is_eos = ids == tok.EOS
    seen = jnp.cumsum(is_eos, axis=-1) - is_eos
    mask = (seen == 0).astype(jnp.float32)
    probs = model.apply(params, batch, state, feed, mask,
                        deterministic=True, method=type(model).score_text)
    logp = jnp.log(probs + 1e-12)
    # token at t+1 predicted from position t
    tgt = ids[:, :, 1:]
    lp = jnp.take_along_axis(logp[:, :, :-1], tgt[..., None], -1)[..., 0]
    valid = mask[:, :, 1:]
    return np.asarray((lp * valid).sum(-1))  # (B,S)


def test_beam1_equals_greedy(setup):
    cfg, model, params, batch = setup
    from svpc_tpu.decode.beam import beam_decode
    from svpc_tpu.decode.greedy import greedy_decode
    g = np.asarray(greedy_decode(model, params, batch))
    b = np.asarray(beam_decode(model, params, batch, beam_size=1))
    np.testing.assert_array_equal(g, b)


def test_beam_scores_no_worse(setup):
    cfg, model, params, batch = setup
    from svpc_tpu.decode.beam import beam_decode
    from svpc_tpu.decode.greedy import greedy_decode
    g = np.asarray(greedy_decode(model, params, batch))
    b3 = np.asarray(beam_decode(model, params, batch, beam_size=3))
    lp_g = _hyp_logprob(model, params, batch, g)
    lp_b = _hyp_logprob(model, params, batch, b3)
    step_mask = np.asarray(batch["step_mask"])
    assert ((lp_b - lp_g) * step_mask >= -1e-3).all(), (
        f"beam found lower-probability hypotheses:\n{lp_b - lp_g}")


def test_beam_nbest_ranked(setup):
    """n_best returns ranked hypotheses: rank 0 equals the n_best=1
    output, scores are non-increasing, and each hypothesis's returned
    score matches the shape contract."""
    cfg, model, params, batch = setup
    from svpc_tpu.decode.beam import beam_decode

    best = np.asarray(beam_decode(model, params, batch, beam_size=3))
    toks, scores = beam_decode(model, params, batch, beam_size=3, n_best=3)
    toks, scores = np.asarray(toks), np.asarray(scores)
    B, S, T = best.shape
    assert toks.shape == (B, 3, S, T)
    assert scores.shape == (B, 3, S)
    np.testing.assert_array_equal(toks[:, 0], best)
    step_mask = np.asarray(batch["step_mask"]).astype(bool)
    diffs = np.diff(scores, axis=1)          # (B,2,S)
    assert (diffs[:, :, :][..., step_mask.any(0)] <= 1e-6).all()

    with pytest.raises(ValueError):
        beam_decode(model, params, batch, beam_size=2, n_best=3)


def test_beam_packed_equals_dense(setup):
    """Beam decode on the packed clip layout must be bit-identical to the
    dense layout (round-1 VERDICT item 5: beam ran only on dense)."""
    cfg, model, params, batch = setup
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.decode.beam import beam_decode

    batch_np = {k: np.asarray(v) for k, v in batch.items()}
    packed = {k: jnp.asarray(v) for k, v in pack_batch(
        batch_np, cfg.model.max_t_len, clip_multiple=2).items()}

    dense = np.asarray(beam_decode(model, params, batch, beam_size=3))
    pk = np.asarray(beam_decode(model, params, packed, beam_size=3))
    step_mask = np.asarray(batch["step_mask"]).astype(bool)
    np.testing.assert_array_equal(dense[step_mask], pk[step_mask])

    d_t, d_s = beam_decode(model, params, batch, beam_size=3, n_best=2)
    p_t, p_s = beam_decode(model, params, packed, beam_size=3, n_best=2)
    for r in range(2):
        np.testing.assert_array_equal(
            np.asarray(d_t)[:, r][step_mask], np.asarray(p_t)[:, r][step_mask])
        np.testing.assert_allclose(
            np.asarray(d_s)[:, r][step_mask], np.asarray(p_s)[:, r][step_mask],
            rtol=1e-6, atol=1e-6)


def test_beam_cached_equals_uncached(setup):
    """KV-cached beam scoring (caches gathered on every reorder) must be
    bit-identical to the full per-position re-run."""
    from svpc_tpu.decode.beam import beam_decode
    cfg, model, params, batch = setup
    for k in (2, 3):
        cached = np.asarray(beam_decode(model, params, batch,
                                        beam_size=k, use_cache=True))
        full = np.asarray(beam_decode(model, params, batch,
                                      beam_size=k, use_cache=False))
        np.testing.assert_array_equal(cached, full)
