"""Greedy autoregressive decoding as one jit-compiled ``lax.scan``.

Reference: translator.py:45-163 — a python loop per example, re-running the
decoder over all positions for every emitted token.  Here the whole batch
decodes in one compiled scan over ``max_t_len`` positions (the per-position
full re-run is mathematically identical to KV-cached decoding for this
causal decoder; the scan keeps the exact reference semantics: UNK
suppressed with -1e10, copy-produced OOV ids tracked in a parallel
extended-id buffer and fed back as UNK, position 0 forced to [BOS]).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from svpc_tpu import tokenization as tok
from svpc_tpu.config import ModelConfig

NEG = -1e10


def greedy_decode(model, params, batch,
                  use_cache: bool = True) -> jnp.ndarray:
    """Returns extended token ids (B, S, T): [BOS], then argmax tokens.

    ``use_cache=True`` decodes incrementally with per-layer KV caches —
    O(T) instead of the reference's O(T^2) full re-runs, bit-identical
    results (tests/test_cached_decode.py).  Call under jit
    (see make_greedy_fn)."""
    cfg: ModelConfig = model.cfg
    T, V, C = cfg.max_t_len, cfg.vocab_size, cfg.extended_vocab_size
    packed = "clip_video" in batch
    if packed:
        # pseudo-batch of packed clips: batch axis N, one step
        from svpc_tpu.model.svpc import clip_view
        B, S = batch["clip_input_ids"].shape[0], 1
        head_batch = clip_view(batch)
    else:
        B, S, _ = batch["input_ids"].shape
        head_batch = batch

    state = model.apply(params, batch, deterministic=True,
                        method=type(model).encode)

    if cfg.model_mode == "video":
        ext = jnp.full((B,), V, jnp.int32)
    else:
        ext = (V + head_batch["oov_count"]).astype(jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)
    col_ok = cols[None, :] < ext[:, None]              # (B, C)
    col_ok = col_ok & (cols[None, :] != tok.UNK)       # UNK never wins

    text_ids0 = jnp.zeros((B, S, T), jnp.int32)        # all [PAD]
    ext_ids0 = jnp.zeros((B, S, T), jnp.int32)
    text_mask0 = jnp.zeros((B, S, T), jnp.float32)
    next0 = jnp.full((B, S), tok.BOS, jnp.int32)

    def argmax_step(cur):
        cur = jnp.where(col_ok[:, None, :], cur, NEG)   # (B, S, C)
        nw = jnp.argmax(cur, axis=-1).astype(jnp.int32)  # (B, S)
        return jnp.where(nw >= V, tok.UNK, nw), nw       # (feed, extended)

    # T-1 scoring iterations: iteration t writes position t then selects
    # the token for position t+1.  Scoring at t = T-1 would run a full
    # decoder step + head whose argmax no buffer holds — the final token
    # is written outside the scan instead (same structure as beam.py).
    steps = jnp.arange(max(T - 1, 0), dtype=jnp.int32)
    if use_cache:
        caches0, enc_kv = model.apply(params, (B, S), state,
                                      method=type(model).init_decode_caches)

        def step(carry, t):
            text_ids, ext_ids, next_sym, oov_next, caches = carry
            text_ids = jax.lax.dynamic_update_index_in_dim(
                text_ids, next_sym, t, axis=2)
            ext_ids = jax.lax.dynamic_update_index_in_dim(
                ext_ids, oov_next, t, axis=2)
            cur, caches = model.apply(
                params, head_batch, state, next_sym, t, caches, enc_kv,
                method=type(model).score_position_cached)
            new_next, new_oov = argmax_step(cur)
            return (text_ids, ext_ids, new_next, new_oov, caches), None

        carry0 = (text_ids0, ext_ids0, next0, next0, caches0)
        (text_ids, ext_ids, next_sym, oov_next, _), _ = jax.lax.scan(
            step, carry0, steps)
    else:
        def step(carry, t):
            text_ids, ext_ids, text_mask, next_sym, oov_next = carry
            text_ids = jax.lax.dynamic_update_index_in_dim(
                text_ids, next_sym, t, axis=2)
            ext_ids = jax.lax.dynamic_update_index_in_dim(
                ext_ids, oov_next, t, axis=2)
            text_mask = jax.lax.dynamic_update_index_in_dim(
                text_mask, jnp.ones((B, S), jnp.float32), t, axis=2)

            cur = model.apply(params, head_batch, state, text_ids,
                              text_mask, t, method=type(model).score_position)
            new_next, new_oov = argmax_step(cur)
            return (text_ids, ext_ids, text_mask, new_next, new_oov), None

        carry0 = (text_ids0, ext_ids0, text_mask0, next0, next0)
        (text_ids, ext_ids, _, next_sym, oov_next), _ = jax.lax.scan(
            step, carry0, steps)
    # the token selected on the last iteration lands in the final slot
    text_ids = jax.lax.dynamic_update_index_in_dim(
        text_ids, next_sym, T - 1, axis=2)
    ext_ids = jax.lax.dynamic_update_index_in_dim(
        ext_ids, oov_next, T - 1, axis=2)

    out = text_ids if cfg.model_mode == "video" else ext_ids
    if packed:
        # scatter (N, 1, T) clip rows back onto the (B, S, T) grid the
        # postprocess layer consumes
        Bv, Sv = batch["step_mask"].shape
        rows = out[:, 0] * batch["clip_mask"].astype(out.dtype)[:, None]
        out = jnp.zeros((Bv, Sv, T), out.dtype).at[
            batch["clip_video"], batch["clip_step"]].add(rows)
    return out


def make_greedy_fn(model):
    """jit-compiled greedy decoder over a device batch."""
    @jax.jit
    def fn(params, batch):
        return greedy_decode(model, params, batch)
    return fn
