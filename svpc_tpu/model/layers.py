"""Transformer building blocks (post-LN, BERT-style).

Faithful re-derivations of the reference blocks (model.py:143-319,
:565-694, :697-739) in flax.linen with fixed shapes and mask-driven
attention.  The additive mask semantics ``(1 - m) * -10000`` are preserved
exactly (model.py:194) for token-level parity with the reference.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from svpc_tpu.config import ModelConfig


def dense_init(cfg: ModelConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


def erf_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) gelu, matching reference model.py:58-64."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or any(
        d.platform in ("tpu", "axon") for d in jax.devices())


class LayerNorm(nn.Module):
    """TF-style layernorm (eps inside the sqrt), reference model.py:143-156."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        # two-pass biased variance E[(x-u)^2] exactly like the reference
        # (and torch.var(unbiased=False)); flax's default
        # use_fast_variance=True computes E[x^2]-E[x]^2 instead, which
        # cancels catastrophically when |mean| >> std — a latent
        # token-flip risk on the greedy parity path.
        orig_dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                           dtype=jnp.float32, use_fast_variance=False,
                           name="ln")(x)
        return out.astype(orig_dtype)


def attention_core(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mask: jnp.ndarray, *, num_heads: int,
    dropout_rate: float, deterministic: bool,
    dropout_rng: Optional[jax.Array] = None,
    module: Optional[nn.Module] = None,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention.

    q (N, Lq, H), k/v (N, L, H), mask (N, Lq, L) or (N, 1, L) float 1/0.
    Additive masking ``(1-m) * -1e4`` as in reference model.py:194.
    """
    n, lq, h = q.shape
    l = k.shape[1]
    dh = h // num_heads
    qh = q.reshape(n, lq, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(n, l, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(n, l, num_heads, dh).transpose(0, 2, 1, 3)

    scores = jnp.einsum("nhqd,nhkd->nhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh)
    add_mask = (1.0 - mask[:, None, :, :].astype(jnp.float32)) * -10000.0
    scores = scores + add_mask
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs.astype(v.dtype)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(n, lq, h)


class MultiHeadAttention(nn.Module):
    """QKV projections + attention core.  No output projection — the
    reference's BertSelfAttention (model.py:159-220) leaves the output
    dense to BertSelfOutput, and the decoder uses the raw context.

    setup-style so cached decoding can drive the projections separately
    (project_q / project_kv / attend)."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        init = dense_init(cfg)
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.query = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt)
        self.key = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt)
        self.value = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dt)

    def project_q(self, x):
        return self.query(x)

    def project_kv(self, x):
        return self.key(x), self.value(x)

    def attend(self, q, k, v, mask):
        return attention_core(
            q, k, v, mask, num_heads=self.cfg.num_attention_heads,
            dropout_rate=0.0, deterministic=True)

    def __call__(self, q_states, k_states, v_states, mask, deterministic=True):
        cfg = self.cfg
        q = self.query(q_states)
        k = self.key(k_states)
        v = self.value(v_states)
        if cfg.use_pallas and deterministic and _on_tpu():
            from svpc_tpu.ops.pallas_attention import fused_attention
            return fused_attention(q, k, v, mask, cfg.num_attention_heads)
        rng = None
        if not deterministic and cfg.attention_probs_dropout_prob > 0:
            rng = self.make_rng("dropout")
        return attention_core(
            q, k, v, mask, num_heads=cfg.num_attention_heads,
            dropout_rate=cfg.attention_probs_dropout_prob,
            deterministic=deterministic, dropout_rng=rng)


class SelfOutput(nn.Module):
    """dense → dropout → LN(x + input) (reference model.py:222-233)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        cfg = self.cfg
        h = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg),
                     dtype=hidden.dtype, name="dense")(hidden)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        return LayerNorm(cfg, name="layer_norm")(h + residual)


class AttentionBlock(nn.Module):
    """Self-attention + SelfOutput (reference BertAttention, model.py:236-253)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        ctx = MultiHeadAttention(self.cfg, name="self")(
            x, x, x, mask, deterministic=deterministic)
        return SelfOutput(self.cfg, name="output")(ctx, x, deterministic)


class Intermediate(nn.Module):
    """dense → gelu (reference BertIntermediate, model.py:256-265)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, kernel_init=dense_init(self.cfg),
                     dtype=x.dtype, name="dense")(x)
        return erf_gelu(h)


# The reference's BertOutput (model.py:278-289) is the same dense→dropout→
# LN(x+residual) shape as BertSelfOutput — flax Dense infers the input dim,
# so one module serves both; param paths come from the instance `name=`,
# so checkpoint layout is unchanged.
OutputBlock = SelfOutput


class EncoderLayer(nn.Module):
    """Untied encoder layer (reference BertLayerNoMemoryUntied,
    model.py:565-591): AttentionBlock → Intermediate → Output."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, mask_1d, diagonal_mask=False, deterministic=True):
        lq = x.shape[1]
        mask = mask_1d[:, None, :]  # (N, 1, L)
        if diagonal_mask:
            causal = jnp.tril(jnp.ones((lq, lq), dtype=x.dtype))
            mask = mask * causal[None, :, :]
        attn_out = AttentionBlock(self.cfg, name="attention")(
            x, mask, deterministic=deterministic)
        inter = Intermediate(self.cfg, name="intermediate")(attn_out)
        return OutputBlock(self.cfg, name="output")(inter, attn_out, deterministic)


def _pp_rng_setup(module, mesh, n_micro: int):
    """Per-microbatch dropout-key DATA for a pipelined trunk.

    Typed PRNG keys don't ride through the pipeline's zero-initialized
    carries, so the raw uint32 key data travels in the activation pytree
    and each stage re-wraps it.  Returns ``(key_data (n_micro, ksz),
    impl_spec_or_None)``; stages fold in the dp axis index so dropout
    masks stay decorrelated across data-parallel shards, and fold a
    constant per layer so consecutive layers draw independent masks.
    Handles both typed keys (jax.random.key — the train loop's rbg
    stream) and legacy uint32 PRNGKey arrays (impl None)."""
    base = module.make_rng("dropout")
    if jnp.issubdtype(base.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(base)
        kd = jax.random.key_data(jax.random.split(base, n_micro))
    else:  # legacy (2,) uint32 key array — already raw data
        impl = None
        kd = jax.random.split(base, n_micro)
    return kd, impl


# fold constant for advancing the dropout key chain layer-to-layer; far
# outside any plausible dp axis index so the layer-advance stream can
# never collide with a dp-shard-local stream by construction (the two
# would otherwise alias at dp index 1 and rest on Flax's module-path
# fold-in for decorrelation — round-3 advisor finding)
_PP_LAYER_FOLD = 0x50505050


def _pp_stage_rngs(kd, impl, mesh):
    """(dropout rngs dict for this stage, next microbatch key data)."""
    key = kd if impl is None else jax.random.wrap_key_data(kd, impl=impl)
    local = key
    if "dp" in mesh.shape:
        local = jax.random.fold_in(key, jax.lax.axis_index("dp"))
    nxt = jax.random.fold_in(key, _PP_LAYER_FOLD)
    if impl is not None:
        nxt = jax.random.key_data(nxt)
    return {"dropout": local}, nxt


def _pp_trunk_call(owner, layer, call, x, riding, deterministic):
    """Shared GPipe dispatch for Encoder/Decoder._pp_call.

    ``x`` is the evolving activation (batch-major), ``riding`` a tuple of
    batch-major arrays each layer consumes unchanged, and
    ``call(layer, p, h, riding, rngs)`` applies ONE layer functionally
    (``rngs`` is None on the deterministic path).  Stacks the owner's
    ``layer_i`` param subtrees, microbatches with dp-aligned splits,
    threads per-microbatch dropout-key data when training, and merges
    the pipeline output back to batch-major."""
    from jax.sharding import PartitionSpec as P
    from svpc_tpu.parallel import pipeline as pl

    cfg, mesh = owner.cfg, owner.pp_mesh
    dp = mesh.shape.get("dp", 1)
    n_micro = pl.auto_microbatches(x.shape[0], owner.pp_microbatches,
                                   dp, mesh.shape["pp"])
    own_params = owner.variables["params"]
    if "layers" in own_params:
        # pipeline-RESIDENT layout (stack_trunk_params): the stacked
        # leaves are already stored sharded P("pp", ...) — consumed
        # shard-wise by the gpipe shard_map, no gather, no restack
        stacked = own_params["layers"]
    else:
        stacked = pl.stack_layers(
            [own_params[f"layer_{i}"]
             for i in range(cfg.num_hidden_layers)])
    if mesh.shape.get("tp", 1) > 1:
        stacked = pl.pin_stacked_tp(stacked, mesh)
    split = lambda a: pl.split_microbatches(a, n_micro, dp)
    mb = P(None, "dp") if "dp" in mesh.shape else P(None)
    need_rng = not deterministic and (
        cfg.hidden_dropout_prob > 0
        or cfg.attention_probs_dropout_prob > 0)

    if need_rng:
        kd, impl = _pp_rng_setup(owner, mesh, n_micro)
        mbs = (split(x),) + tuple(split(r) for r in riding) + (kd,)
        specs = (mb,) * (1 + len(riding)) + (P(None),)

        def stage(p, act):
            h, *rest = act
            rngs, nxt = _pp_stage_rngs(rest[-1], impl, mesh)
            y = call(layer, p, h, tuple(rest[:-1]), rngs)
            return (y, *rest[:-1], nxt)
    else:
        mbs = (split(x),) + tuple(split(r) for r in riding)
        specs = (mb,) * (1 + len(riding))

        def stage(p, act):
            h, *rest = act
            y = call(layer, p, h, tuple(rest), None)
            return (y, *rest)

    out = pl.gpipe(stage, stacked, mbs, mesh,
                   batch_axis="dp" if "dp" in mesh.shape else None,
                   mb_specs=specs, remat=cfg.remat)
    return pl.merge_microbatches(out[0], dp)


class Encoder(nn.Module):
    """Stack of EncoderLayers (reference BertEncoderNoMemoryUntied).

    ``cfg.remat`` rematerializes each layer on the backward pass
    (jax.checkpoint): only layer inputs are saved, activations are
    recomputed — same values, ~num_layers× less transformer activation
    memory (tests/test_remat.py).

    ``pp_mesh`` (a Mesh carrying a "pp" axis) routes the layer stack
    through the GPipe primitive (parallel/pipeline.py): params stacked on
    a leading layer axis and sharded over pp, microbatched activations
    hand-to-hand over ICI via ppermute.  Same math as the sequential loop
    (sum losses make microbatching exact; tests/test_pipeline.py), same
    parameter tree (checkpoints are layout-identical either way)."""
    cfg: ModelConfig
    pp_mesh: Optional[object] = None
    pp_microbatches: int = 0

    @nn.compact
    def __call__(self, x, mask_1d, diagonal_mask=False, deterministic=True):
        if self.pp_mesh is not None and not self.is_initializing():
            return self._pp_call(x, mask_1d, diagonal_mask, deterministic)

        def run(layer, x, mask_1d):
            return layer(x, mask_1d, diagonal_mask, deterministic)

        if self.cfg.remat:
            run = nn.remat(run)
        for i in range(self.cfg.num_hidden_layers):
            x = run(EncoderLayer(self.cfg, name=f"layer_{i}"), x, mask_1d)
        return x

    def _pp_call(self, x, mask_1d, diagonal_mask, deterministic):
        layer = EncoderLayer(self.cfg, parent=None)  # functional template

        def call(layer, p, h, riding, rngs):
            (m,) = riding
            if rngs is None:
                return layer.apply({"params": p}, h, m, diagonal_mask,
                                   deterministic)
            return layer.apply({"params": p}, h, m, diagonal_mask, False,
                               rngs=rngs)

        return _pp_trunk_call(self, layer, call, x, (mask_1d,),
                              deterministic)


class DecoderLayer(nn.Module):
    """Untied decoder layer (reference BertDecoderLayerNoMemoryUntied,
    model.py:620-663): causal self-attn → LN residual → cross-attn →
    LN residual (residual is the *self-attn output*) → OutputBlock."""
    cfg: ModelConfig

    def setup(self):
        self.self_attention = MultiHeadAttention(self.cfg)
        self.norm1 = LayerNorm(self.cfg)
        self.dec_enc_attention = MultiHeadAttention(self.cfg)
        self.norm2 = LayerNorm(self.cfg)
        self.output = OutputBlock(self.cfg)

    def __call__(self, dec, dec_mask, enc_out, enc_mask, deterministic=True):
        lt = dec.shape[1]
        causal = jnp.tril(jnp.ones((lt, lt), dtype=dec.dtype))
        self_mask = dec_mask[:, None, :] * causal[None, :, :]

        attn = self.self_attention(dec, dec, dec, self_mask,
                                   deterministic=deterministic)
        attn = self.norm1(attn + dec)

        cross = self.dec_enc_attention(attn, enc_out, enc_out,
                                       enc_mask[:, None, :],
                                       deterministic=deterministic)
        cross = self.norm2(attn + cross)

        return self.output(cross, cross, deterministic)

    def project_enc_kv(self, enc_out):
        """Cross-attention K/V of the static encoder memory, projected
        once per decode instead of once per position (``step`` would
        otherwise re-run these dense layers for every emitted token)."""
        return self.dec_enc_attention.project_kv(enc_out)

    def step(self, x_t, k_cache, v_cache, t, enc_k, enc_v, enc_mask):
        """Incremental decode for one position.

        x_t (N, 1, H); k_cache/v_cache (N, T, H) hold projected self-attn
        keys/values for positions < t (zeros elsewhere — exactly masked
        out, so results are bit-identical to the full recompute).
        enc_k/enc_v (N, M, H) are ``project_enc_kv`` outputs.
        Returns (y_t (N, 1, H), k_cache, v_cache)."""
        n, T, _ = k_cache.shape
        k_t, v_t = self.self_attention.project_kv(x_t)     # (N, 1, H)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_t.astype(k_cache.dtype), t, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_t.astype(v_cache.dtype), t, axis=1)

        q_t = self.self_attention.project_q(x_t)           # (N, 1, H)
        pos_ok = (jnp.arange(T)[None, None, :] <= t).astype(x_t.dtype)
        attn = self.self_attention.attend(
            q_t, k_cache.astype(x_t.dtype), v_cache.astype(x_t.dtype),
            jnp.broadcast_to(pos_ok, (n, 1, T)))
        attn = self.norm1(attn + x_t)

        cross_q = self.dec_enc_attention.project_q(attn)
        cross = self.dec_enc_attention.attend(
            cross_q, enc_k, enc_v, enc_mask[:, None, :])
        cross = self.norm2(attn + cross)
        y = self.output(cross, cross, True)
        return y, k_cache, v_cache


class Decoder(nn.Module):
    """``pp_mesh`` pipelines the layer stack exactly like Encoder's
    (GPipe over the "pp" mesh axis); the incremental ``step``/
    ``project_enc_kv`` decode path stays sequential — per-token KV-cached
    work is latency-bound, not trunk-bound."""
    cfg: ModelConfig
    pp_mesh: Optional[object] = None
    pp_microbatches: int = 0

    def setup(self):
        self.layers = [DecoderLayer(self.cfg, name=f"layer_{i}")
                       for i in range(self.cfg.num_hidden_layers)]

    def __call__(self, dec, dec_mask, enc_out, enc_mask, deterministic=True):
        if self.pp_mesh is not None and not self.is_initializing():
            return self._pp_call(dec, dec_mask, enc_out, enc_mask,
                                 deterministic)

        def run(layer, dec, dec_mask, enc_out, enc_mask):
            return layer(dec, dec_mask, enc_out, enc_mask, deterministic)

        if self.cfg.remat:
            # save only layer inputs; recompute on backward (same values —
            # the incremental `step` path is inference-only and unwrapped)
            run = nn.remat(run)
        for layer in self.layers:
            dec = run(layer, dec, dec_mask, enc_out, enc_mask)
        return dec

    def _pp_call(self, dec, dec_mask, enc_out, enc_mask, deterministic):
        layer = DecoderLayer(self.cfg, parent=None)  # functional template

        def call(layer, p, h, riding, rngs):
            m, eo, em = riding
            if rngs is None:
                return layer.apply({"params": p}, h, m, eo, em,
                                   deterministic)
            return layer.apply({"params": p}, h, m, eo, em, False,
                               rngs=rngs)

        return _pp_trunk_call(self, layer, call, dec,
                              (dec_mask, enc_out, enc_mask), deterministic)

    def project_enc_kv(self, enc_out):
        """Per-layer cross-attention (K, V) of the static encoder memory —
        computed once per decode, reused by every ``step``."""
        return [layer.project_enc_kv(enc_out) for layer in self.layers]

    def step(self, x_t, caches, t, enc_kv, enc_mask):
        """One incremental position through all layers.
        caches: list of (k_cache, v_cache) per layer;
        enc_kv: ``project_enc_kv`` output (per-layer cross K/V)."""
        new_caches = []
        for layer, (k_c, v_c), (e_k, e_v) in zip(self.layers, caches, enc_kv):
            x_t, k_c, v_c = layer.step(x_t, k_c, v_c, t, e_k, e_v, enc_mask)
            new_caches.append((k_c, v_c))
        return x_t, new_caches


class PredictionHeadTransform(nn.Module):
    """dense → gelu → LN (reference model.py:697-709)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.hidden_size, kernel_init=dense_init(self.cfg),
                     dtype=x.dtype, name="dense")(x)
        return LayerNorm(self.cfg, name="layer_norm")(erf_gelu(h))


class LMPredictionHead(nn.Module):
    """transform → vocab projection (+bias) (reference model.py:712-739).

    When ``cfg.share_wd_cls_weight`` the caller passes the tied word
    embedding matrix as ``shared_embedding`` (vocab, H)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, shared_embedding: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        h = PredictionHeadTransform(cfg, name="transform")(x)
        if cfg.share_wd_cls_weight:
            assert shared_embedding is not None
            logits = h @ shared_embedding.T.astype(h.dtype)
        else:
            logits = nn.Dense(cfg.padded_vocab_size, use_bias=False,
                              kernel_init=dense_init(cfg), dtype=h.dtype,
                              name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros,
                          (cfg.padded_vocab_size,))
        logits = logits + bias.astype(logits.dtype)
        # drop tp-padding columns so everything downstream (softmax,
        # pointer-gen extended vocab, greedy argmax) sees exactly V logits
        return logits[..., : cfg.vocab_size]
