"""Batched beam-search decoding.

The reference advertises beam search (--use_beam/--beam_size/--n_best,
train.py:546-548) but the implementation was deleted from the repo — only
greedy remains (SURVEY §2.2: translate_batch ignores use_beam).  This is a
real, jit-compiled batched implementation: every (video, step) decodes K
hypotheses in one ``lax.scan``, with the same masking semantics as the
greedy decoder (UNK suppressed, per-example OOV-extended columns, copy ids
tracked in an extended buffer and fed back as UNK).

Runs on both layouts: the dense (B, S, ...) step grid and the packed clip
layout (data/packing.py) — packed clips decode as a pseudo-batch exactly
like decode/greedy.py and scatter back onto the (B, S) grid.

Scoring: sum of token log-probabilities with an optional length penalty
((5+len)/6)^alpha (GNMT); alpha=0 reduces to plain sum.  ``n_best > 1``
returns the ranked top-n hypotheses with their scores (the reference's
--n_best surface).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from svpc_tpu import tokenization as tok
from svpc_tpu.config import ModelConfig

NEG = -1e9


def beam_decode(model, params, batch, beam_size: int = 2,
                length_penalty: float = 0.0,
                use_cache: bool = True, n_best: int = 1):
    """Beam-search decode.

    Returns extended token ids (B, S, T) of the best beam when
    ``n_best == 1``; with ``n_best > 1`` returns ``(tokens, scores)``
    where tokens is (B, n_best, S, T) ranked best-first and scores is the
    matching (B, n_best, S) (post length penalty).

    ``use_cache=True`` scores each position incrementally with per-layer
    KV caches (O(T) decoder work like the greedy path) — caches are
    gathered alongside the beams on every top-k reorder, bit-identical
    to the full re-run (tests/test_beam.py)."""
    cfg: ModelConfig = model.cfg
    T, V, C = cfg.max_t_len, cfg.vocab_size, cfg.extended_vocab_size
    K = beam_size
    if not 1 <= n_best <= K:
        raise ValueError(f"n_best={n_best} must be in [1, beam_size={K}]")
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
    col_ok = (cols[None, :] < ext[:, None]) & (cols[None, :] != tok.UNK)
    col_ok = col_ok[:, None, None, :]                  # (B,1,1,C)

    # replicate K times along a beam axis folded into B — but only what
    # the scorer actually reads: head_probs consumes the four head keys
    # (entity_mask/copy_ids/copy_weights/oov_count) and decode_hidden
    # reads only ``state``.  Replicating the full dense batch would
    # materialize K copies of the (B, S, Lv, D) video features in HBM
    # that nothing downstream touches.
    def rep(x):
        return jnp.repeat(x, K, axis=0)

    head_keys = ("entity_mask", "copy_ids", "copy_weights", "oov_count")
    beam_batch = {k: rep(head_batch[k]) for k in head_keys
                  if k in head_batch}
    beam_state = jax.tree.map(rep, state)

    text_ids0 = jnp.zeros((B, K, S, T), jnp.int32)
    ext_ids0 = jnp.zeros((B, K, S, T), jnp.int32)
    # the (B,K,S,T) attention-mask buffer is only consumed by the full
    # re-run path; the cached path carries none
    mask0 = None if use_cache else jnp.zeros((B, K, S, T), jnp.float32)
    scores0 = jnp.zeros((B, K, S), jnp.float32)
    # only beam 0 is live initially (all beams identical at t=0)
    scores0 = scores0.at[:, 1:, :].set(NEG)
    next0 = jnp.full((B, K, S), tok.BOS, jnp.int32)
    finished0 = jnp.zeros((B, K, S), bool)
    lengths0 = jnp.zeros((B, K, S), jnp.float32)

    # enc_kv is a decode-time constant (cross-attention K/V projected
    # once); it stays out of the scan carry and is closed over
    caches0, enc_kv = (model.apply(params, (B * K, S), beam_state,
                                   method=type(model).init_decode_caches)
                       if use_cache else (None, None))

    def step(carry, t):
        (text_ids, ext_ids, mask, scores, next_sym, oov_next, finished,
         lengths, caches) = carry
        text_ids = jax.lax.dynamic_update_index_in_dim(
            text_ids, next_sym, t, axis=3)
        ext_ids = jax.lax.dynamic_update_index_in_dim(
            ext_ids, oov_next, t, axis=3)

        if use_cache:
            probs, caches = model.apply(
                params, beam_batch, beam_state,
                next_sym.reshape(B * K, S), t, caches, enc_kv,
                method=type(model).score_position_cached)
        else:
            mask = jax.lax.dynamic_update_index_in_dim(
                mask, jnp.ones((B, K, S), jnp.float32), t, axis=3)
            flat_ids = text_ids.reshape(B * K, S, T)
            flat_mask = mask.reshape(B * K, S, T)
            probs = model.apply(params, beam_batch, beam_state, flat_ids,
                                flat_mask, t,
                                method=type(model).score_position)
        logp = jnp.log(probs.reshape(B, K, S, C) + 1e-12)
        logp = jnp.where(col_ok, logp, NEG)

        # finished beams: only PAD continuation, at zero cost
        pad_only = jnp.full((C,), NEG).at[tok.PAD].set(0.0)
        logp = jnp.where(finished[..., None], pad_only[None, None, None, :],
                         logp)

        cand = scores[..., None] + logp                # (B,K,S,C)
        cand_flat = cand.transpose(0, 2, 1, 3).reshape(B, S, K * C)
        top_scores, top_idx = jax.lax.top_k(cand_flat, K)   # (B,S,K)
        src_beam = (top_idx // C).astype(jnp.int32)
        token = (top_idx % C).astype(jnp.int32)
        top_scores = top_scores.transpose(0, 2, 1)     # (B,K,S)
        src_beam = src_beam.transpose(0, 2, 1)
        token = token.transpose(0, 2, 1)

        def gather_beams(x):
            # x (B,K,S,...) indexed by src_beam (B,K,S) per (b,s)
            return jnp.take_along_axis(
                x, src_beam.reshape(src_beam.shape + (1,) * (x.ndim - 3)),
                axis=1)

        text_ids = gather_beams(text_ids)
        ext_ids = gather_beams(ext_ids)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        lengths = jnp.take_along_axis(lengths, src_beam, axis=1)
        if use_cache:
            # a reordered beam inherits its source beam's KV history
            def gather_cache(c):
                # cache rows are flattened (B*K*S, ...) in (b, k, s) order
                x = c.reshape((B, K, S) + c.shape[1:])
                idx = src_beam.reshape(src_beam.shape + (1,) * (x.ndim - 3))
                return jnp.take_along_axis(x, idx, axis=1).reshape(c.shape)

            caches = jax.tree.map(gather_cache, caches)

        new_finished = finished | (token == tok.EOS)
        lengths = jnp.where(finished, lengths, lengths + 1.0)
        oov_next2 = token
        next2 = jnp.where(token >= V, tok.UNK, token)

        return (text_ids, ext_ids, mask, top_scores, next2, oov_next2,
                new_finished, lengths, caches), None

    carry0 = (text_ids0, ext_ids0, mask0, scores0, next0, next0,
              finished0, lengths0, caches0)
    # T-1 select iterations: iteration t writes position t and selects the
    # token for position t+1.  Selecting at t = T-1 would accumulate the
    # log-prob (and length) of a position-T token that no buffer holds —
    # a phantom that skews truncated hypotheses against finished ones.
    (text_ids, ext_ids, _, scores, next_sym, oov_next, _, lengths,
     _), _ = jax.lax.scan(
        step, carry0, jnp.arange(max(T - 1, 0), dtype=jnp.int32))
    # the token selected on the last iteration lands in the final slot
    text_ids = jax.lax.dynamic_update_index_in_dim(
        text_ids, next_sym, T - 1, axis=3)
    ext_ids = jax.lax.dynamic_update_index_in_dim(
        ext_ids, oov_next, T - 1, axis=3)

    if length_penalty > 0:
        norm = ((5.0 + lengths) / 6.0) ** length_penalty
        scores = scores / norm
    out = ext_ids if cfg.model_mode != "video" else text_ids

    # rank beams best-first and keep n_best
    order = jnp.argsort(-scores, axis=1)[:, :n_best]    # (B,n,S)
    ranked_scores = jnp.take_along_axis(scores, order, axis=1)
    ranked = jnp.take_along_axis(out, order[..., None], axis=1)  # (B,n,S,T)

    if packed:
        # scatter (N, n, 1, T) clip rows back onto the (Bv, n, Sv, T)
        # grid (same mechanics as decode/greedy.py, per rank)
        Bv, Sv = batch["step_mask"].shape
        cmask = batch["clip_mask"]
        rows = ranked[:, :, 0] * cmask.astype(ranked.dtype)[:, None, None]
        ranked = jnp.zeros((Bv, n_best, Sv, T), ranked.dtype).at[
            batch["clip_video"], :, batch["clip_step"]].add(rows)
        srows = ranked_scores[:, :, 0] * cmask.astype(scores.dtype)[:, None]
        ranked_scores = jnp.zeros((Bv, n_best, Sv), scores.dtype).at[
            batch["clip_video"], :, batch["clip_step"]].add(srows)

    if n_best == 1:
        return ranked[:, 0]                             # (B,S,T)
    return ranked, ranked_scores
