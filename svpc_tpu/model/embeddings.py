"""Embedding modules.

Reference: model.py:67-140 (sinusoidal PEs), :484-562 (untied text/video/
ingredient embeddings).  The reference's per-example python loop that
mean-pools ingredient word vectors between [SEP] markers
(model.py:125-134) is replaced by a single segment-matrix matmul.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from svpc_tpu.config import ModelConfig
from svpc_tpu.model.layers import LayerNorm, dense_init


def sinusoid_table(max_len: int, dim: int) -> np.ndarray:
    """Classic transformer PE table (reference model.py:80-92)."""
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                      * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def add_position_encoding(x: jnp.ndarray, max_len: int = 500) -> jnp.ndarray:
    """x (..., L, D) + PE[:L]."""
    pe = jnp.asarray(sinusoid_table(max_len, x.shape[-1]), dtype=x.dtype)
    return x + pe[: x.shape[-2]]


class WordFC(nn.Module):
    """LN → dropout → Dense(word_vec→hidden) → ReLU → LN
    (reference model.py:493-499)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        if cfg.compute_dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        h = LayerNorm(cfg, name="ln_in")(x)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        h = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                     dtype=x.dtype, name="dense")(h)
        h = jax.nn.relu(h)
        return LayerNorm(cfg, name="ln_out")(h)


class WordEmbedding(nn.Module):
    """GloVe-initializable word embedding table (padded_vocab, word_vec).

    Rows beyond ``vocab_size`` (present only under ``vocab_pad_multiple``
    > 1, the tensor-parallel layout) are never indexed — input ids are
    always < vocab_size (OOV ids live only in labels/copy arrays)."""
    cfg: ModelConfig

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(self.cfg.initializer_range),
            (self.cfg.padded_vocab_size, self.cfg.word_vec_size))

    def __call__(self, ids):
        return jnp.take(self.embedding, ids, axis=0)


class TextEmbeddings(nn.Module):
    """word embedding → WordFC → positional encoding
    (reference BertEmbeddingsTextUntied, model.py:484-513)."""
    cfg: ModelConfig

    def setup(self):
        self.word_embeddings = WordEmbedding(self.cfg)
        self.word_fc = WordFC(self.cfg)

    def __call__(self, text_ids, deterministic=True):
        emb = self.word_embeddings(text_ids)
        emb = self.word_fc(emb, deterministic)
        return add_position_encoding(emb, self.cfg.max_position_embeddings)

    def embed_position(self, tok_ids, t):
        """Embed tokens that all sit at sequence position ``t``:
        tok_ids (..., 1) -> (..., 1, H) with PE row t added."""
        emb = self.word_fc(self.word_embeddings(tok_ids), True)
        pe = jnp.asarray(
            sinusoid_table(self.cfg.max_position_embeddings, emb.shape[-1]),
            dtype=emb.dtype)
        return emb + jax.lax.dynamic_index_in_dim(pe, t, axis=0,
                                                  keepdims=False)

    @property
    def table(self):
        return self.word_embeddings.embedding


class VideoEmbeddings(nn.Module):
    """LN → dropout → Dense(feat→hidden) → ReLU → LN → PE
    (reference BertEmbeddingsVideoUntied, model.py:540-562)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, video_features, deterministic=True):
        cfg = self.cfg
        h = LayerNorm(cfg, name="ln_in")(video_features)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        h = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                     dtype=h.dtype, name="dense")(h)
        h = jax.nn.relu(h)
        h = LayerNorm(cfg, name="ln_out")(h)
        return add_position_encoding(h, cfg.max_position_embeddings)


def entity_segment_matrix(ingr_sep_mask: jnp.ndarray, max_entities: int) -> jnp.ndarray:
    """(.., I) sep mask -> (.., E, I) mean-pool matrix.

    Row e averages the word positions strictly between the (e-1)-th and
    e-th [SEP] (reference model.py:125-134: the span *excludes* the SEP
    itself).  Rows for absent entities are all-zero.
    """
    sep = ingr_sep_mask.astype(jnp.float32)
    # segment id of each position = number of SEPs strictly before it
    seg_id = jnp.cumsum(sep, axis=-1) - sep
    pos_is_word = 1.0 - sep  # SEP positions excluded from the mean
    e_ids = jnp.arange(max_entities, dtype=seg_id.dtype)
    member = (seg_id[..., None, :] == e_ids[:, None]) * pos_is_word[..., None, :]
    # only entities that actually have a terminating SEP exist
    n_entities = jnp.sum(sep, axis=-1, keepdims=True)  # (..., 1)
    exists = (e_ids[:, None] < n_entities[..., None, :]).astype(jnp.float32)
    member = member * exists
    counts = jnp.sum(member, axis=-1, keepdims=True)
    return member / jnp.maximum(counts, 1.0)


class IngredientEmbeddings(nn.Module):
    """word embedding → WordFC → per-ingredient span mean-pool →
    ingredient-level sinusoidal PE
    (reference BertEmbeddingsIngredientsUntied + IngredientPositionEncoding,
    model.py:106-140, :515-537)."""
    cfg: ModelConfig

    def setup(self):
        self.word_embeddings = WordEmbedding(self.cfg)
        self.word_fc = WordFC(self.cfg)

    def __call__(self, ingr_ids, ingr_sep_mask, deterministic=True):
        cfg = self.cfg
        emb = self.word_embeddings(ingr_ids)
        emb = self.word_fc(emb, deterministic)  # (B, I, H)
        seg = entity_segment_matrix(ingr_sep_mask, cfg.max_entities)
        pooled = jnp.einsum("bei,bih->beh", seg.astype(emb.dtype), emb)
        # PE row e depends only on e; table just needs to cover max_entities
        return add_position_encoding(
            pooled, max(cfg.max_position_embeddings, cfg.max_entities))


class TokenTypeEmbeddings(nn.Module):
    """4-way token-type table.  NOTE the reference indexes this table with
    the *token ids* of the video span (PAD=0/CLS=1/SEP=2/VID=3), not the
    token_type_ids array (model.py:890)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding", nn.initializers.normal(self.cfg.initializer_range),
            (self.cfg.type_vocab_size, self.cfg.hidden_size))
        return jnp.take(table, ids, axis=0)
