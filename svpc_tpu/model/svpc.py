"""State-aware recursive transformer — the top model.

Reference: StateAwareRecursiveTransformer (model.py:826-1189).  The
reference's per-example python loop (model.py:1059) and per-step encoding
loop (:1038) are replaced by fully batched fixed-shape computation:

  * every clip of every example is encoded in one ``(B*S, Lv)`` encoder call,
  * the step-level recurrence (visual simulator) is a ``lax.scan``,
  * per-example ragged entity/OOV structure is carried by masks,
  * losses reproduce the reference's sum-over-examples semantics.

Ablation modes: "full" (vivt), "reason_copy" (viv), "copy" (vi),
"video" (v) — src/train.py:614-621.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from svpc_tpu import tokenization as tok
from svpc_tpu.config import ModelConfig
from svpc_tpu.model.embeddings import (
    IngredientEmbeddings, TextEmbeddings, TokenTypeEmbeddings,
    VideoEmbeddings, add_position_encoding,
)
from svpc_tpu.model.layers import (
    Decoder, Encoder, LMPredictionHead, dense_init,
)
from svpc_tpu.model.lstm import BiLSTM
from svpc_tpu.model.pointer import PointerGenerator
from svpc_tpu.model.reasoner import EntityReasoner, ReasonerOutputs
from svpc_tpu.ops.gumbel import gumbel_softmax_st
from svpc_tpu.ops.losses import asymmetric_loss_sum, bce_sum, label_smoothing_kl

NEG_INF = -1e30


def clip_view(batch) -> Dict[str, jnp.ndarray]:
    """Per-clip view of the per-video arrays the LM head + pointer
    machinery read — lets score_text / score_position_cached run on a
    packed (N, 1, ...) pseudo-batch unchanged.  Parameter-free: usable
    inside and outside module scope."""
    cv = batch["clip_video"]
    return dict(
        entity_mask=batch["entity_mask"][cv],
        copy_ids=batch["copy_ids"][cv],
        copy_weights=batch["copy_weights"][cv],
        oov_count=batch["oov_count"][cv],
    )


class ModelOutputs(NamedTuple):
    total_loss: jnp.ndarray
    caption_loss: jnp.ndarray
    entity_loss: jnp.ndarray
    action_loss: jnp.ndarray
    re_entity_loss: jnp.ndarray
    re_action_loss: jnp.ndarray
    prediction_scores: jnp.ndarray     # (B, S, T, C) probabilities
    ent_probs: Optional[jnp.ndarray]   # (B, S, E)
    ac_probs: Optional[jnp.ndarray]    # (B, S, A)
    re_ent_probs: Optional[jnp.ndarray]
    re_ac_probs: Optional[jnp.ndarray]
    memory: Optional[Dict[str, jnp.ndarray]]


class EncodedState(NamedTuple):
    """Everything the decoder needs, computed once per batch."""
    step_vectors: jnp.ndarray          # (B, S, H)
    ingr_vectors: jnp.ndarray          # (B, E, H), invalid rows zeroed
    ga_inputs: jnp.ndarray             # (B, S, M, H) cross-attention memory
    pointer_vectors: Optional[jnp.ndarray]  # (B, S, E, H) or None (video mode)
    reasoner: Optional[ReasonerOutputs]


class SVPCModel(nn.Module):
    """``pp_mesh`` (a Mesh with a "pp" axis) pipelines the clip-encoder
    and decoder trunks via GPipe (parallel/pipeline.py) — the
    ``cli.train --pp_size`` path.  The step_wise_encoder stays sequential
    (S <= 16 tokens of work; a pipeline there is all bubble).  The param
    tree is identical either way, so checkpoints / interop / decay
    grouping are unaffected."""
    cfg: ModelConfig
    pp_mesh: Optional[Any] = None
    pp_microbatches: int = 0

    @property
    def compute_dtype(self):
        return (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                else jnp.float32)

    def setup(self):
        cfg = self.cfg
        self.ingredient_embeddings = IngredientEmbeddings(cfg)
        self.video_embeddings = VideoEmbeddings(cfg)
        self.text_embeddings = TextEmbeddings(cfg)
        self.token_type_embeddings = TokenTypeEmbeddings(cfg)
        self.encoder = Encoder(cfg, pp_mesh=self.pp_mesh,
                               pp_microbatches=self.pp_microbatches)
        self.step_wise_encoder = Encoder(cfg)
        dt = self.compute_dtype
        if cfg.model_mode in ("full", "reason_copy"):
            self.reasoner = EntityReasoner(cfg)
            self.Wac = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                                dtype=dt)
            self.Went = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                                 dtype=dt)
        self.decoder = Decoder(cfg, pp_mesh=self.pp_mesh,
                               pp_microbatches=self.pp_microbatches)
        self.decoder_classifier = LMPredictionHead(cfg)
        if cfg.model_mode in ("full", "reason_copy", "copy"):
            self.pointer_generator = PointerGenerator(cfg)
        if cfg.model_mode == "full":
            self.recipe_encoder = BiLSTM(cfg.hidden_size)
            self.recipe_reasoner = EntityReasoner(cfg)

    # ------------------------------------------------------------------ #
    # encoding
    # ------------------------------------------------------------------ #

    def encode_clips(self, batch, deterministic=True) -> jnp.ndarray:
        """Encode every clip's video span; return per-clip [CLS] summaries
        already step-position-encoded and step-encoded: (B, S, H).

        Reference: forward_step (model.py:887-894) + step stacking and
        step_wise_encoder (model.py:1063-1065).
        """
        cfg = self.cfg
        B, S, L = batch["input_ids"].shape
        # the video span is whatever the batch carries (the host pipeline
        # may slice it to a bucketed length <= cfg.max_v_len)
        Lv = L - cfg.max_t_len
        vid_feat = batch["video_feature"][:, :, :Lv, :].astype(self.compute_dtype)
        vid_ids = batch["input_ids"][:, :, :Lv]
        vid_mask = batch["input_mask"][:, :, :Lv]

        flat = lambda x: x.reshape((B * S,) + x.shape[2:])
        emb = self.video_embeddings(flat(vid_feat), deterministic)
        emb = emb + self.token_type_embeddings(flat(vid_ids)).astype(emb.dtype)
        enc = self.encoder(emb, flat(vid_mask), diagonal_mask=False,
                           deterministic=deterministic)      # (B*S, Lv, H)
        cls_vec = enc[:, 0, :].reshape(B, S, -1)              # (B, S, H)

        # step-level PE (PositionEncoding(max_len=50), model.py:839)
        step_in = add_position_encoding(cls_vec, 50)
        step_vectors = self.step_wise_encoder(
            step_in, batch["step_mask"], diagonal_mask=False,
            deterministic=deterministic)
        return step_vectors

    def encode_clips_packed(self, batch, deterministic=True) -> jnp.ndarray:
        """Packed variant: encode only the real clips (N, L) and scatter
        their [CLS] summaries onto the (B, S) step grid (zeros at padded
        steps — masked as keys everywhere downstream, exactly like the
        dense path's garbage-but-masked padded slots).

        Avoids the reference's padded-grid work entirely (the mean YC2
        video fills 7.7 of 12 padded train steps / 16 eval steps —
        data/packing.py).
        """
        cfg = self.cfg
        N, L = batch["clip_input_ids"].shape
        Lv = L - cfg.max_t_len
        B, S = batch["step_mask"].shape

        feat = batch["clip_video_feature"][:, :Lv, :].astype(self.compute_dtype)
        emb = self.video_embeddings(feat, deterministic)
        emb = emb + self.token_type_embeddings(
            batch["clip_input_ids"][:, :Lv]).astype(emb.dtype)
        enc = self.encoder(emb, batch["clip_input_mask"][:, :Lv],
                           diagonal_mask=False,
                           deterministic=deterministic)       # (N, Lv, H)
        cls_vec = enc[:, 0, :] * batch["clip_mask"][:, None].astype(enc.dtype)

        grid = jnp.zeros((B, S, cls_vec.shape[-1]), cls_vec.dtype)
        grid = grid.at[batch["clip_video"], batch["clip_step"]].add(cls_vec)

        step_in = add_position_encoding(grid, 50)
        return self.step_wise_encoder(
            step_in, batch["step_mask"], diagonal_mask=False,
            deterministic=deterministic)

    def encode(self, batch, deterministic=True) -> EncodedState:
        """Full encode: clips, ingredients, reasoner, cross-attn memory.

        Handles both layouts: dense (B, S, ...) grids and packed per-clip
        batches (data/packing.py), where ga_inputs / pointer_vectors come
        out gathered per clip as (N, 1, M, H) / (N, 1, E, H) — a pseudo-
        batch with batch axis N and one step, on which every downstream
        scorer works unchanged."""
        cfg = self.cfg
        packed = "clip_video" in batch
        if packed:
            step_vectors = self.encode_clips_packed(batch, deterministic)
        else:
            step_vectors = self.encode_clips(batch, deterministic)
        B, S, H = step_vectors.shape

        ingr_vectors = None
        reasoner_out = None
        pointer_vectors = None

        if cfg.model_mode != "video":
            ingr_vectors = self.ingredient_embeddings(
                batch["ingr_ids"], batch["ingr_sep_mask"], deterministic)
            ingr_vectors = ingr_vectors * batch["entity_mask"][..., None] \
                .astype(ingr_vectors.dtype)

        if cfg.model_mode in ("full", "reason_copy"):
            reasoner_out = self.reasoner(
                step_vectors, ingr_vectors, batch["entity_mask"],
                deterministic=deterministic)
            ent_vec = jax.nn.relu(self.Went(reasoner_out.step_entity_vectors))
            act_vec = jax.nn.relu(self.Wac(reasoner_out.step_action_vectors))
            ga_inputs = jnp.stack(
                [step_vectors, ent_vec, act_vec], axis=2)     # (B, S, 3, H)
            pointer_vectors = reasoner_out.all_entity_vectors  # (B, S, E, H)
        elif cfg.model_mode == "copy":
            # mean over *valid* entities (reference slices then means,
            # model.py:989)
            emask = batch["entity_mask"][..., None]
            mean_ingr = (jnp.sum(ingr_vectors * emask, axis=1)
                         / jnp.maximum(jnp.sum(emask, axis=1), 1.0))  # (B, H)
            ga_inputs = jnp.stack(
                [step_vectors, jnp.broadcast_to(
                    mean_ingr[:, None, :], step_vectors.shape)], axis=2)
            pointer_vectors = jnp.broadcast_to(
                ingr_vectors[:, None], (B, S) + ingr_vectors.shape[1:])
        else:  # video
            ga_inputs = step_vectors[:, :, None, :]           # (B, S, 1, H)

        if packed:
            cv, cs = batch["clip_video"], batch["clip_step"]
            ga_inputs = ga_inputs[cv, cs][:, None]            # (N, 1, M, H)
            if pointer_vectors is not None:
                pointer_vectors = pointer_vectors[cv, cs][:, None]

        return EncodedState(
            step_vectors=step_vectors,
            ingr_vectors=(ingr_vectors if ingr_vectors is not None
                          else jnp.zeros((B, cfg.max_entities, H))),
            ga_inputs=ga_inputs,
            pointer_vectors=pointer_vectors,
            reasoner=reasoner_out,
        )

    # ------------------------------------------------------------------ #
    # decoding (teacher-forced and greedy share this scorer)
    # ------------------------------------------------------------------ #

    def decode_hidden(self, state: EncodedState, text_ids, text_mask,
                      deterministic=True) -> jnp.ndarray:
        """Run the causal decoder over a text hypothesis -> (B, S, T, H)."""
        B, S, T = text_ids.shape
        M = state.ga_inputs.shape[2]
        text_emb = self.text_embeddings(text_ids.reshape(B * S, T), deterministic)
        dec = self.decoder(
            text_emb, text_mask.reshape(B * S, T),
            state.ga_inputs.reshape(B * S, M, -1),
            jnp.ones((B * S, M), text_emb.dtype),
            deterministic=deterministic)                      # (B*S, T, H)
        return dec.reshape(B, S, T, -1)

    def head_probs(self, batch, state: EncodedState, dec) -> jnp.ndarray:
        """LM head (+ pointer-generator) over decoder states
        dec (B, S, T', H) -> (B, S, T', C) probabilities.  T' may be a
        slice of positions — the head is positionwise, so scoring one
        position is exactly equal to scoring all and slicing.
        """
        cfg = self.cfg
        shared = (self.text_embeddings.table
                  if cfg.share_wd_cls_weight else None)
        logits = self.decoder_classifier(dec, shared)
        # probabilities always in f32 (loss/decode numerics)
        vocab_probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        if cfg.model_mode == "video":
            return jnp.pad(vocab_probs,
                           ((0, 0), (0, 0), (0, 0), (0, cfg.max_oov)))

        probs = self.pointer_generator(
            dec, state.pointer_vectors, batch["entity_mask"],
            batch["copy_ids"], batch["copy_weights"], vocab_probs)
        # zero out the columns beyond each example's actual extended size
        C = cfg.extended_vocab_size
        cols = jnp.arange(C, dtype=jnp.int32)
        ext = (cfg.vocab_size + batch["oov_count"]).astype(jnp.int32)
        col_valid = (cols[None, :] < ext[:, None]).astype(probs.dtype)
        return probs * col_valid[:, None, None, :]

    def score_text(self, batch, state: EncodedState, text_ids, text_mask,
                   deterministic=True) -> jnp.ndarray:
        """Decoder + LM head (+ pointer-generator) over a text hypothesis;
        returns (B, S, T, C) probabilities (C = V + max_oov; columns beyond
        the actual extended size are zero).

        Reference: decode (model.py:925-1015) minus the loss.
        """
        dec = self.decode_hidden(state, text_ids, text_mask, deterministic)
        return self.head_probs(batch, state, dec)

    def score_position(self, batch, state: EncodedState, text_ids,
                       text_mask, t) -> jnp.ndarray:
        """Scores for position ``t`` only -> (B, S, C).  The decoder still
        attends causally over positions <= t; only the (vocab-sized) head
        and copy machinery are restricted to one position — a pure compute
        saving with identical results (greedy parity tests cover this)."""
        dec = self.decode_hidden(state, text_ids, text_mask, True)
        dec_t = jax.lax.dynamic_slice_in_dim(dec, t, 1, axis=2)  # (B,S,1,H)
        return self.head_probs(batch, state, dec_t)[:, :, 0, :]

    def init_decode_caches(self, batch_shape, state: EncodedState):
        """Decode-time constants + mutable caches: per-layer zeroed (k, v)
        self-attention caches, and the cross-attention K/V of the static
        encoder memory projected ONCE (every ``score_position_cached``
        would otherwise re-run those dense layers per emitted token).
        Returns ``(self_caches, enc_kv)``; keep ``enc_kv`` out of scan
        carries — it never changes."""
        cfg = self.cfg
        B, S = batch_shape
        dt = self.compute_dtype
        self_caches = [
            (jnp.zeros((B * S, cfg.max_t_len, cfg.hidden_size), dt),
             jnp.zeros((B * S, cfg.max_t_len, cfg.hidden_size), dt))
            for _ in range(cfg.num_hidden_layers)
        ]
        M = state.ga_inputs.shape[2]
        enc_out = state.ga_inputs.reshape(B * S, M, -1)
        return self_caches, self.decoder.project_enc_kv(enc_out)

    def score_position_cached(self, batch, state: EncodedState, tok_t,
                              t, caches, enc_kv):
        """Incremental decode: embed the tokens at position ``t``, run one
        cached decoder step, score that position.

        tok_t (B, S) int32 -> (probs (B, S, C), new caches).  ``enc_kv``
        is ``init_decode_caches``'s precomputed cross K/V.  Zero cache
        slots beyond ``t`` are exactly masked out of the softmax, so
        results are bit-identical to the full recompute
        (tests/test_cached_decode.py)."""
        B, S = tok_t.shape
        M = enc_kv[0][0].shape[1]
        x_t = self.text_embeddings.embed_position(
            tok_t.reshape(B * S, 1), t)                    # (B*S, 1, H)
        enc_mask = jnp.ones((B * S, M), x_t.dtype)
        y_t, caches = self.decoder.step(x_t, caches, t, enc_kv, enc_mask)
        probs = self.head_probs(batch, state, y_t.reshape(B, S, 1, -1))
        return probs[:, :, 0, :], caches

    # ------------------------------------------------------------------ #
    # textual re-simulator
    # ------------------------------------------------------------------ #

    def reconstruct(self, batch, prediction_scores, text_mask, ingr_vectors,
                    deterministic=True,
                    oov_count: Optional[jnp.ndarray] = None) -> ReasonerOutputs:
        """Straight-through re-simulation over generated text
        (reference model.py:1017-1025).

        Dense: prediction_scores (B, S, T, C).  Packed: (N, 1, T, C) with
        ``oov_count`` the per-clip gather; the per-step BoW means are
        scattered onto the (B, S) grid before the recipe BiLSTM."""
        cfg = self.cfg
        packed = "clip_video" in batch
        _, _, T, C = prediction_scores.shape
        eps = 1e-12
        logits = jnp.log(prediction_scores + eps)
        # exclude the fixed-shape padding columns the reference never has
        if oov_count is None:
            oov_count = batch["oov_count"]
        ext = (cfg.vocab_size + oov_count).astype(jnp.int32)
        cols = jnp.arange(C, dtype=jnp.int32)
        logits = jnp.where(cols[None, None, None, :] < ext[:, None, None, None],
                           logits, NEG_INF)
        rng = self.make_rng("gumbel")
        onehot = gumbel_softmax_st(rng, logits, cfg.temperature)
        bow = (onehot[..., : cfg.vocab_size]
               @ self.text_embeddings.table[: cfg.vocab_size])  # (B,S,T,W)

        tm = text_mask[..., None]
        counts = jnp.maximum(jnp.sum(tm, axis=2), 1.0)
        step_bow = jnp.sum(bow * tm, axis=2) / counts          # (B, S, W)

        if packed:  # scatter per-clip rows onto the step grid
            B, S = batch["step_mask"].shape
            rows = step_bow[:, 0] * batch["clip_mask"][:, None] \
                .astype(step_bow.dtype)
            step_bow = jnp.zeros((B, S, rows.shape[-1]), rows.dtype) \
                .at[batch["clip_video"], batch["clip_step"]].add(rows)

        hs = self.recipe_encoder(step_bow, batch["step_mask"])  # (B, S, 2H)
        hs = hs[..., : cfg.hidden_size] + hs[..., cfg.hidden_size:]
        return self.recipe_reasoner(hs, ingr_vectors, batch["entity_mask"],
                                    deterministic=deterministic)

    # ------------------------------------------------------------------ #
    # full forward + losses
    # ------------------------------------------------------------------ #

    def _action_loss(self, probs, targets, row_mask):
        """Action supervision: ASL by default (the reference hardcodes
        AsymmetricLoss at model.py:872 despite advertising
        --use_asl bce at train.py:512); use_asl=False makes the
        advertised BCE ablation real (same sum reduction + row masking)."""
        if self.cfg.use_asl:
            return asymmetric_loss_sum(probs, targets, row_mask)
        return bce_sum(probs, targets, row_mask[..., None])

    def __call__(self, batch, deterministic: bool = True,
                 return_memory: bool = False) -> ModelOutputs:
        cfg = self.cfg
        T = cfg.max_t_len
        packed = "clip_video" in batch

        state = self.encode(batch, deterministic)

        if packed:
            # pseudo-batch: batch axis = packed clips, one step
            N, L = batch["clip_input_ids"].shape
            Lv = L - T
            B, S = N, 1
            text_ids = batch["clip_input_ids"][:, None, Lv:]
            text_mask = batch["clip_input_mask"][:, None, Lv:]
            labels = batch["clip_input_labels"][:, None, Lv:]
            head_batch = clip_view(batch)
        else:
            B, S, L = batch["input_ids"].shape
            Lv = L - T
            text_ids = batch["input_ids"][:, :, Lv:]
            text_mask = batch["input_mask"][:, :, Lv:]
            labels = batch["input_labels"][:, :, Lv:]          # extended ids
            head_batch = batch

        if cfg.model_mode == "video":
            # OOV labels fold to UNK (model.py:1013)
            labels = jnp.where(labels >= cfg.vocab_size, tok.UNK, labels)
            ext_size = jnp.full((B,), cfg.vocab_size, jnp.int32)
        else:
            ext_size = (cfg.vocab_size
                        + head_batch["oov_count"]).astype(jnp.int32)

        probs = self.score_text(head_batch, state, text_ids, text_mask,
                                deterministic)

        # caption loss — only over C_actual columns; rows from padded steps
        # carry IGNORE labels already (data pipeline)
        flat_probs = probs.reshape(-1, probs.shape[-1])
        flat_labels = labels.reshape(-1)
        flat_ext = jnp.repeat(ext_size, S * T, total_repeat_length=B * S * T)
        caption_loss = label_smoothing_kl(
            flat_probs, flat_labels, flat_ext, cfg.label_smoothing)

        zero = jnp.zeros((), probs.dtype)
        entity_loss = action_loss = re_entity_loss = re_action_loss = zero
        ent_probs = ac_probs = re_ent_probs = re_ac_probs = None
        memory: Optional[Dict[str, jnp.ndarray]] = None

        if cfg.model_mode in ("full", "reason_copy"):
            r = state.reasoner
            sup_mask = (batch["step_mask"][..., None]
                        * batch["entity_mask"][:, None, :])
            entity_loss = bce_sum(r.ent_probs, batch["alignment"], sup_mask)
            action_loss = self._action_loss(
                r.ac_probs, batch["action"], batch["action_row_mask"])
            ent_probs, ac_probs = r.ent_probs, r.ac_probs
            if return_memory:
                memory = dict(
                    entity_probs=r.ent_probs, action_probs=r.ac_probs,
                    ingr_vectors=state.ingr_vectors,
                    step_entity_vectors=r.all_entity_vectors)

        if cfg.model_mode == "full":
            re = self.reconstruct(batch, probs, text_mask,
                                  state.ingr_vectors, deterministic,
                                  oov_count=head_batch["oov_count"])
            sup_mask = (batch["step_mask"][..., None]
                        * batch["entity_mask"][:, None, :])
            re_entity_loss = bce_sum(re.ent_probs, batch["alignment"], sup_mask)
            re_action_loss = self._action_loss(
                re.ac_probs, batch["action"], batch["action_row_mask"])
            re_ent_probs, re_ac_probs = re.ent_probs, re.ac_probs
            if return_memory:
                memory.update(
                    re_pred_entity_probs=re.ent_probs,
                    re_pred_action_probs=re.ac_probs,
                    re_entity_vectors=re.all_entity_vectors)

        total = (caption_loss + entity_loss + action_loss
                 + cfg.lambda_ * (re_entity_loss + re_action_loss))
        return ModelOutputs(
            total_loss=total, caption_loss=caption_loss,
            entity_loss=entity_loss, action_loss=action_loss,
            re_entity_loss=re_entity_loss, re_action_loss=re_action_loss,
            prediction_scores=probs, ent_probs=ent_probs, ac_probs=ac_probs,
            re_ent_probs=re_ent_probs, re_ac_probs=re_ac_probs, memory=memory)
