"""Visual simulator: the entity reasoning network.

Reference: EntitiyReasoningNetwork (model.py:742-823) — a sequential
per-step loop selecting actions (Eq.1), attending/selecting entities
(Eq.2-5) and updating the entity state memory (Eq.6-7).

TPU-first redesign: every parameterized projection depends only on the
per-step video vector, so all of them are computed batched over (B, S)
*outside* the recurrence; the ``lax.scan`` carries only
``(entity_vectors, prev_ent_attn)`` and is parameter-free.  Invalid entity
slots are masked (probability 0), reproducing the reference's ragged
per-example slicing under fixed shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from svpc_tpu.config import ModelConfig
from svpc_tpu.model.layers import dense_init


class ReasonerOutputs(NamedTuple):
    ent_probs: jnp.ndarray        # (B, S, E)  sigmoid entity probabilities
    ac_probs: jnp.ndarray         # (B, S, A)  sigmoid action probabilities
    step_entity_vectors: jnp.ndarray   # (B, S, H) attended entity vector (bar_e_t)
    all_entity_vectors: jnp.ndarray    # (B, S, E, H) post-update entity memory
    step_action_vectors: jnp.ndarray   # (B, S, W) prob-weighted action embedding (bar_f_t)


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


class EntityReasoner(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, step_vectors, entity_init, entity_mask,
                 deterministic=True) -> ReasonerOutputs:
        """step_vectors (B,S,H), entity_init (B,E,H) already zero on invalid
        slots, entity_mask (B,E)."""
        cfg = self.cfg
        init = dense_init(cfg)
        dt = step_vectors.dtype
        B, S, H = step_vectors.shape
        E = entity_init.shape[1]

        # ---- per-step projections, batched outside the recurrence ----
        # (1) action selector (Eq.1)
        h = nn.Dense(cfg.lstm_hidden_size, kernel_init=init, dtype=dt,
                     name="action_selector_0")(step_vectors)
        h = jax.nn.relu(h)
        # the reference hardcodes p=0.4 here (model.py:757); surfaced as
        # cfg.reasoner_dropout_prob (default 0.4) so numerics-parity
        # tests can zero EVERY stochastic path
        h = nn.Dropout(cfg.reasoner_dropout_prob)(
            h, deterministic=deterministic)
        ac_probs = jax.nn.sigmoid(
            nn.Dense(cfg.action_vocab_size, kernel_init=init, dtype=dt,
                     name="action_selector_1")(h))  # (B,S,A)

        action_table = self.param(
            "action_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.action_vocab_size, cfg.word_vec_size))
        bar_ft = (_safe_div(ac_probs, ac_probs.sum(-1, keepdims=True))
                  @ action_table.astype(dt))

        # (2) entity selector precomputations (Eq.2-3)
        hat_ht = jax.nn.relu(
            nn.Dense(cfg.lstm_hidden_size, kernel_init=init, dtype=dt,
                     name="W1")(step_vectors))
        w2_vec = nn.Dense(cfg.lstm_hidden_size, kernel_init=init, dtype=dt,
                          name="W2")(
            jnp.concatenate([hat_ht, ac_probs], axis=-1))  # (B,S,H)
        choice = jax.nn.softmax(
            nn.Dense(3, kernel_init=init, dtype=dt, name="W3")(hat_ht),
            axis=-1)  # (B,S,3)

        # (3) updater precomputation (Eq.6): scalar gate from bar_f_t
        w4 = nn.Dense(1, kernel_init=init, dtype=dt, name="W4")(bar_ft)  # (B,S,1)

        emask = entity_mask.astype(step_vectors.dtype)  # (B,E)

        def step(carry, xs):
            entity_vectors, prev_attn = carry      # (B,E,H), (B,E)
            w2_t, choice_t, w4_t = xs              # (B,H), (B,3), (B,1)
            ent_prob = jax.nn.sigmoid(
                jnp.einsum("beh,bh->be", entity_vectors, w2_t)) * emask
            attn = choice_t[:, 0:1] * ent_prob + choice_t[:, 1:2] * prev_attn
            attn_norm = _safe_div(attn, attn.sum(-1, keepdims=True))
            bar_et = jnp.einsum("be,beh->bh", attn_norm, entity_vectors)
            kt = jax.nn.relu(w4_t * bar_et)        # (B,H)
            new_entities = (attn[..., None] * kt[:, None, :]
                            + (1.0 - attn)[..., None] * entity_vectors)
            return (new_entities, ent_prob), (ent_prob, bar_et, new_entities)

        xs = (w2_vec.transpose(1, 0, 2), choice.transpose(1, 0, 2),
              w4.transpose(1, 0, 2))
        init_carry = (entity_init * emask[..., None],
                      jnp.zeros((B, E), step_vectors.dtype))
        _, (ent_probs, bar_et_seq, all_entities) = jax.lax.scan(step, init_carry, xs)

        return ReasonerOutputs(
            ent_probs=ent_probs.transpose(1, 0, 2),
            ac_probs=ac_probs,
            step_entity_vectors=bar_et_seq.transpose(1, 0, 2),
            all_entity_vectors=all_entities.transpose(1, 0, 2, 3),
            step_action_vectors=bar_ft,
        )
