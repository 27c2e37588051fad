"""Pointer-generator copy network.

Reference: pointer_generator_network (model.py:896-923).  The reference
scatters copy attention onto the (possibly OOV-extended) vocabulary with a
python dict-of-lists loop per ingredient; here the scatter is a dense
``(E, C)`` copy matrix built from per-entity id groups
(``copy_ids``/``copy_weights``, see data/pipeline.py) and applied as one
einsum — MXU-friendly and fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from svpc_tpu.config import ModelConfig
from svpc_tpu.model.layers import dense_init

NEG_INF = -1e30


class PointerGenerator(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, decoder_outputs, ingr_vectors, entity_mask,
                 copy_ids, copy_weights, vocab_probs):
        """
        Args:
          decoder_outputs: (B, S, T, H)
          ingr_vectors:    (B, S, E, H) per-step entity vectors
          entity_mask:     (B, E)
          copy_ids:        (B, E, K) extended-vocab scatter targets
          copy_weights:    (B, E, K)
          vocab_probs:     (B, S, T, V) softmaxed LM head output
        Returns:
          (B, S, T, C) mixed generation+copy distribution, C = V + max_oov.
        """
        cfg = self.cfg
        init = dense_init(cfg)
        B, S, T, H = decoder_outputs.shape
        C = cfg.extended_vocab_size

        wing = nn.Dense(cfg.intermediate_size, kernel_init=init,
                        dtype=ingr_vectors.dtype, name="wing")(
            ingr_vectors)  # (B,S,E,H)
        attn_logits = jnp.einsum("bseh,bsth->bste", wing, decoder_outputs,
                                 preferred_element_type=jnp.float32)
        emask = entity_mask.astype(jnp.float32)[:, None, None, :]
        attn_logits = jnp.where(emask > 0, attn_logits, NEG_INF)
        attn = jax.nn.softmax(attn_logits, axis=-1)  # over entities, f32
        attn = attn * emask  # zero all-invalid rows cleanly

        attended = jnp.einsum("bste,bseh->bsth",
                              attn.astype(ingr_vectors.dtype), ingr_vectors)
        p_gen = jax.nn.sigmoid(
            nn.Dense(1, kernel_init=init, dtype=decoder_outputs.dtype,
                     name="pgen")(
                jnp.concatenate([decoder_outputs, attended], axis=-1)))  # (B,S,T,1)

        gen = vocab_probs * p_gen
        gen = jnp.pad(gen, ((0, 0), (0, 0), (0, 0), (0, cfg.max_oov)))

        copy_attn = attn * (1.0 - p_gen)  # (B,S,T,E)
        copy_matrix = jnp.einsum(
            "bekc,bek->bec",
            jax.nn.one_hot(copy_ids, C, dtype=gen.dtype), copy_weights)
        copied = jnp.einsum("bste,bec->bstc", copy_attn, copy_matrix)
        return gen + copied
