"""Import a reference PyTorch checkpoint (state_dict) into SVPCModel params.

Enables golden-parity testing and lets users of the reference bring their
trained ``.chkpt`` files to this framework.  Mapping follows the reference
module tree (model.py:826-873); torch ``nn.Linear`` weights are (out, in)
and transpose to flax ``kernel`` (in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _wordfc(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    """Sequential(LN, Dropout, Linear, ReLU, LN) -> ln_in/dense/ln_out."""
    return {
        f"{prefix_f}/ln_in/ln/scale": (f"{prefix_t}.0.weight", None),
        f"{prefix_f}/ln_in/ln/bias": (f"{prefix_t}.0.bias", None),
        f"{prefix_f}/dense/kernel": (f"{prefix_t}.2.weight", "T"),
        f"{prefix_f}/dense/bias": (f"{prefix_t}.2.bias", None),
        f"{prefix_f}/ln_out/ln/scale": (f"{prefix_t}.4.weight", None),
        f"{prefix_f}/ln_out/ln/bias": (f"{prefix_t}.4.bias", None),
    }


def _attention(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    out = {}
    for name in ("query", "key", "value"):
        out[f"{prefix_f}/{name}/kernel"] = (f"{prefix_t}.{name}.weight", "T")
        out[f"{prefix_f}/{name}/bias"] = (f"{prefix_t}.{name}.bias", None)
    return out


def _encoder(prefix_t: str, prefix_f: str, n_layers: int) -> Dict[str, tuple]:
    out = {}
    for i in range(n_layers):
        t = f"{prefix_t}.layer.{i}"
        f = f"{prefix_f}/layer_{i}"
        out.update(_attention(f"{t}.attention.self", f"{f}/attention/self"))
        out[f"{f}/attention/output/dense/kernel"] = (f"{t}.attention.output.dense.weight", "T")
        out[f"{f}/attention/output/dense/bias"] = (f"{t}.attention.output.dense.bias", None)
        out[f"{f}/attention/output/layer_norm/ln/scale"] = (f"{t}.attention.output.LayerNorm.weight", None)
        out[f"{f}/attention/output/layer_norm/ln/bias"] = (f"{t}.attention.output.LayerNorm.bias", None)
        out[f"{f}/intermediate/dense/kernel"] = (f"{t}.hidden_intermediate.dense.weight", "T")
        out[f"{f}/intermediate/dense/bias"] = (f"{t}.hidden_intermediate.dense.bias", None)
        out[f"{f}/output/dense/kernel"] = (f"{t}.output.dense.weight", "T")
        out[f"{f}/output/dense/bias"] = (f"{t}.output.dense.bias", None)
        out[f"{f}/output/layer_norm/ln/scale"] = (f"{t}.output.LayerNorm.weight", None)
        out[f"{f}/output/layer_norm/ln/bias"] = (f"{t}.output.LayerNorm.bias", None)
    return out


def _decoder(prefix_t: str, prefix_f: str, n_layers: int) -> Dict[str, tuple]:
    out = {}
    for i in range(n_layers):
        t = f"{prefix_t}.layer.{i}"
        f = f"{prefix_f}/layer_{i}"
        out.update(_attention(f"{t}.self_attention", f"{f}/self_attention"))
        out.update(_attention(f"{t}.dec_enc_attention", f"{f}/dec_enc_attention"))
        out[f"{f}/norm1/ln/scale"] = (f"{t}.norm1.weight", None)
        out[f"{f}/norm1/ln/bias"] = (f"{t}.norm1.bias", None)
        out[f"{f}/norm2/ln/scale"] = (f"{t}.norm2.weight", None)
        out[f"{f}/norm2/ln/bias"] = (f"{t}.norm2.bias", None)
        out[f"{f}/output/dense/kernel"] = (f"{t}.output.dense.weight", "T")
        out[f"{f}/output/dense/bias"] = (f"{t}.output.dense.bias", None)
        out[f"{f}/output/layer_norm/ln/scale"] = (f"{t}.output.LayerNorm.weight", None)
        out[f"{f}/output/layer_norm/ln/bias"] = (f"{t}.output.LayerNorm.bias", None)
    return out


def _reasoner(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    return {
        # action_embeddings may be a raw Parameter (after GloVe loading) or
        # an nn.Embedding — handled in import_state_dict
        f"{prefix_f}/action_embeddings": (f"{prefix_t}.action_embeddings", None),
        f"{prefix_f}/action_selector_0/kernel": (f"{prefix_t}.action_selector.0.weight", "T"),
        f"{prefix_f}/action_selector_0/bias": (f"{prefix_t}.action_selector.0.bias", None),
        f"{prefix_f}/action_selector_1/kernel": (f"{prefix_t}.action_selector.3.weight", "T"),
        f"{prefix_f}/action_selector_1/bias": (f"{prefix_t}.action_selector.3.bias", None),
        f"{prefix_f}/W1/kernel": (f"{prefix_t}.W1.0.weight", "T"),
        f"{prefix_f}/W1/bias": (f"{prefix_t}.W1.0.bias", None),
        f"{prefix_f}/W2/kernel": (f"{prefix_t}.W2.weight", "T"),
        f"{prefix_f}/W2/bias": (f"{prefix_t}.W2.bias", None),
        f"{prefix_f}/W3/kernel": (f"{prefix_t}.W3.weight", "T"),
        f"{prefix_f}/W3/bias": (f"{prefix_t}.W3.bias", None),
        f"{prefix_f}/W4/kernel": (f"{prefix_t}.W4.weight", "T"),
        f"{prefix_f}/W4/bias": (f"{prefix_t}.W4.bias", None),
    }


def _lstm(prefix_t: str, prefix_f: str) -> Dict[str, tuple]:
    return {
        f"{prefix_f}/w_ih_fwd": (f"{prefix_t}.weight_ih_l0", None),
        f"{prefix_f}/w_hh_fwd": (f"{prefix_t}.weight_hh_l0", None),
        f"{prefix_f}/b_ih_fwd": (f"{prefix_t}.bias_ih_l0", None),
        f"{prefix_f}/b_hh_fwd": (f"{prefix_t}.bias_hh_l0", None),
        f"{prefix_f}/w_ih_bwd": (f"{prefix_t}.weight_ih_l0_reverse", None),
        f"{prefix_f}/w_hh_bwd": (f"{prefix_t}.weight_hh_l0_reverse", None),
        f"{prefix_f}/b_ih_bwd": (f"{prefix_t}.bias_ih_l0_reverse", None),
        f"{prefix_f}/b_hh_bwd": (f"{prefix_t}.bias_hh_l0_reverse", None),
    }


def build_mapping(model_mode: str, n_layers: int) -> Dict[str, tuple]:
    m: Dict[str, tuple] = {}
    m["text_embeddings/word_embeddings/embedding"] = ("text_embeddings.word_embeddings.weight", None)
    m.update(_wordfc("text_embeddings.word_fc", "text_embeddings/word_fc"))
    m["token_type_embeddings/embedding"] = ("token_type_embeddings.weight", None)
    m.update(_wordfc("video_embeddings.video_embeddings", "video_embeddings"))
    m.update(_encoder("encoder", "encoder", n_layers))
    m.update(_encoder("step_wise_encoder", "step_wise_encoder", n_layers))
    m.update(_decoder("decoder", "decoder", n_layers))
    m["decoder_classifier/transform/dense/kernel"] = ("decoder_classifier.transform.dense.weight", "T")
    m["decoder_classifier/transform/dense/bias"] = ("decoder_classifier.transform.dense.bias", None)
    m["decoder_classifier/transform/layer_norm/ln/scale"] = ("decoder_classifier.transform.LayerNorm.weight", None)
    m["decoder_classifier/transform/layer_norm/ln/bias"] = ("decoder_classifier.transform.LayerNorm.bias", None)
    m["decoder_classifier/decoder/kernel"] = ("decoder_classifier.decoder.weight", "T")
    m["decoder_classifier/bias"] = ("decoder_classifier.bias", None)

    if model_mode != "video":
        m["ingredient_embeddings/word_embeddings/embedding"] = ("ingredient_embeddings.word_embeddings.weight", None)
        m.update(_wordfc("ingredient_embeddings.word_fc", "ingredient_embeddings/word_fc"))
        m["pointer_generator/wing/kernel"] = ("Wing.weight", "T")
        m["pointer_generator/wing/bias"] = ("Wing.bias", None)
        m["pointer_generator/pgen/kernel"] = ("pgen_linear.0.weight", "T")
        m["pointer_generator/pgen/bias"] = ("pgen_linear.0.bias", None)
    if model_mode in ("full", "reason_copy"):
        m.update(_reasoner("reasoner", "reasoner"))
        m["Wac/kernel"] = ("Wac.0.weight", "T")
        m["Wac/bias"] = ("Wac.0.bias", None)
        m["Went/kernel"] = ("Went.0.weight", "T")
        m["Went/bias"] = ("Went.0.bias", None)
    if model_mode == "full":
        m.update(_reasoner("recipe_reasoner", "recipe_reasoner"))
        m.update(_lstm("recipe_encoder", "recipe_encoder"))
    return m


def _vocab_axis(f_key: str):
    """Axis of ``f_key`` that carries the (possibly tp-padded) word-vocab
    dimension, or None.  Exactly the params sized by
    ModelConfig.padded_vocab_size: the word-embedding tables
    (embeddings.py:69) and the LM head kernel/bias (layers.py:311-315)."""
    if f_key.endswith("word_embeddings/embedding"):
        return 0
    if f_key == "decoder_classifier/decoder/kernel":
        return 1  # flax kernel is (hidden, vocab)
    if f_key == "decoder_classifier/bias":
        return 0
    return None


def import_state_dict(flax_params, torch_state: Dict[str, np.ndarray],
                      model_mode: str, n_layers: int,
                      vocab_size: int = 0, padded_vocab_size: int = 0):
    """Return flax params with every mapped tensor replaced by the torch
    value.  ``torch_state`` is a {name: np.ndarray} dict (e.g. a loaded
    npz of the reference state_dict).

    Pass ``vocab_size``/``padded_vocab_size`` (ModelConfig) when the flax
    template is tp-padded (vocab_pad_multiple > 1): vocab-axis tensors are
    then zero-padded from exactly ``vocab_size`` to exactly
    ``padded_vocab_size``.  Without them every shape mismatch raises — a
    checkpoint built against a different word2idx must fail loudly, not be
    silently zero-filled into degraded decodes."""
    mapping = build_mapping(model_mode, n_layers)
    flat = {"/".join(k): v for k, v in flatten_dict(flax_params["params"]).items()}
    for f_key, (t_key, transform) in mapping.items():
        if t_key not in torch_state:
            # nn.Embedding form of action_embeddings
            if t_key + ".weight" in torch_state:
                t_key = t_key + ".weight"
            else:
                raise KeyError(f"reference tensor {t_key} not found")
        val = np.asarray(torch_state[t_key])
        if transform == "T":
            val = val.T
        if f_key not in flat:
            raise KeyError(f"flax param {f_key} not found")
        if flat[f_key].shape != val.shape:
            # ONLY the vocab-dim-bearing params may legitimately differ:
            # tp padding (ModelConfig.vocab_pad_multiple) grows their
            # vocab axis from vocab_size to padded_vocab_size, both of
            # which the caller must state explicitly.  Everything else —
            # including a vocab-axis tensor whose source size is not
            # exactly vocab_size (wrong word2idx cache, truncated state
            # dict) — is a config error: raise, do not silently zero-pad.
            target = flat[f_key].shape
            axis = _vocab_axis(f_key)
            ok = (axis is not None and len(target) == val.ndim
                  and padded_vocab_size > vocab_size > 0
                  and val.shape[axis] == vocab_size
                  and target[axis] == padded_vocab_size
                  and all(t == s for d, (t, s)
                          in enumerate(zip(target, val.shape))
                          if d != axis))
            if not ok:
                raise ValueError(
                    f"shape mismatch {f_key}: {target} vs {val.shape}")
            pad = [(0, t - s) for t, s in zip(target, val.shape)]
            val = np.pad(val, pad)
        flat[f_key] = val.astype(np.float32)
    nested = unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
    return {"params": nested}


def export_state_dict(flax_params, model_mode: str, n_layers: int,
                      vocab_size: int = 0, padded_vocab_size: int = 0,
                      ) -> Dict[str, np.ndarray]:
    """Inverse of import_state_dict: a reference-named {name: np.ndarray}
    state dict from flax params, so checkpoints trained here run under the
    reference's test.py / dump_memories.py / translator unchanged.

    ``action_embeddings`` is emitted under its BARE Parameter name
    (``...action_embeddings``, no ``.weight`` suffix) — reference
    checkpoints of record store it GloVe-injected as a raw Parameter, not
    as nn.Embedding (see the comment at the emit site below).  When the
    params were trained tp-padded (vocab_pad_multiple > 1) pass
    vocab_size/padded_vocab_size so padding rows/columns are sliced off."""
    mapping = build_mapping(model_mode, n_layers)
    flat = {"/".join(k): v
            for k, v in flatten_dict(flax_params["params"]).items()}
    out: Dict[str, np.ndarray] = {}
    for f_key, (t_key, transform) in mapping.items():
        if f_key not in flat:
            raise KeyError(f"flax param {f_key} not found")
        val = np.asarray(flat[f_key], dtype=np.float32)
        if transform == "T":
            val = val.T
        if padded_vocab_size > vocab_size > 0:
            # slice padding off ONLY the params known to carry a vocab
            # dim (a coincidental dim == padded_vocab_size elsewhere —
            # e.g. hidden_size at test geometries — must not be cut)
            axis = _vocab_axis(f_key)
            if axis is not None and transform == "T":
                axis = 1 - axis  # val is already in transposed ref layout
            if axis is not None and val.shape[axis] == padded_vocab_size:
                val = np.take(val, np.arange(vocab_size), axis=axis)
        # action_embeddings stays a bare Parameter: reference checkpoints
        # of record store it GloVe-injected, not as nn.Embedding.weight
        out[t_key] = val
    return out


def export_reference_checkpoint(path: str, flax_params, cfg,
                                epoch: int = 0) -> None:
    """torch.save a reference-format ``.chkpt``
    ({"model", "model_cfg", "opt", "epoch"} — reference train.py:401-405)."""
    import torch

    m = cfg.model
    state = {k: torch.from_numpy(v.copy()) for k, v in export_state_dict(
        flax_params, m.model_mode, m.num_hidden_layers,
        vocab_size=m.vocab_size,
        padded_vocab_size=m.padded_vocab_size).items()}
    # the reference loads with strict=True (translator.py:38), so the
    # deterministic sinusoidal PE buffers must be present too
    from svpc_tpu.model.embeddings import sinusoid_table
    pe = sinusoid_table(m.max_position_embeddings, m.hidden_size)
    for name in ("ingredient_embeddings.position_embeddings_ingr.pe",
                 "video_embeddings.position_embeddings_video.pe",
                 "text_embeddings.position_embeddings_text.pe"):
        state[name] = torch.from_numpy(pe.copy())
    state["step_positional_encoding.pe"] = torch.from_numpy(
        sinusoid_table(50, m.hidden_size))  # PositionEncoding(max_len=50)
    # dead MART leftovers present in the reference state dict
    # (BertIntermediate inside BertLayerNoMemoryUntied, model.py:573 —
    # constructed, never called); zeros keep strict load happy
    for enc in ("encoder", "step_wise_encoder"):
        for i in range(m.num_hidden_layers):
            p = f"{enc}.layer.{i}.memory_intermediate.dense"
            state[p + ".weight"] = torch.zeros(m.intermediate_size,
                                               m.hidden_size)
            state[p + ".bias"] = torch.zeros(m.intermediate_size)
    model_cfg = dict(
        hidden_size=m.hidden_size, intermediate_size=m.intermediate_size,
        lstm_hidden_size=m.lstm_hidden_size,
        num_hidden_layers=m.num_hidden_layers,
        num_attention_heads=m.num_attention_heads,
        hidden_dropout_prob=m.hidden_dropout_prob,
        attention_probs_dropout_prob=m.attention_probs_dropout_prob,
        layer_norm_eps=m.layer_norm_eps, vocab_size=m.vocab_size,
        word_vec_size=m.word_vec_size,
        action_vocab_size=m.action_vocab_size,
        video_feature_size=m.video_feature_size, max_v_len=m.max_v_len,
        max_t_len=m.max_t_len, max_i_len=m.max_i_len,
        model_mode=m.model_mode, temperature=m.temperature,
        lambda_=m.lambda_, label_smoothing=m.label_smoothing,
        share_wd_cls_weight=m.share_wd_cls_weight,
        max_position_embeddings=m.max_position_embeddings,
    )
    torch.save({"model": state, "model_cfg": model_cfg, "opt": None,
                "epoch": epoch}, path)
