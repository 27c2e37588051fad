"""Load a reference PyTorch ``.chkpt`` file (torch.save of
``{"model": state_dict, "model_cfg": EasyDict, "opt", "epoch"}`` —
reference train.py:401-405) into an SVPCModel config + params.

Lets reference users bring trained checkpoints straight to this framework
(greedy decoding then reproduces their captions token-for-token).
"""

from __future__ import annotations

import sys
import types
from typing import Tuple

import numpy as np

from svpc_tpu.config import Config, DataConfig, ModelConfig, TrainConfig


def _ensure_easydict():
    """The reference pickles an easydict.EasyDict; provide the class if the
    package is absent."""
    if "easydict" in sys.modules:
        return
    try:
        import easydict  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def load_torch_checkpoint(path: str) -> Tuple[dict, dict]:
    """Returns (model_cfg dict, {name: np.ndarray} state dict)."""
    _ensure_easydict()
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.detach().cpu().numpy() for k, v in ckpt["model"].items()}
    cfg = dict(ckpt["model_cfg"])
    return cfg, state


def model_config_from_reference(ref_cfg: dict, **overrides) -> ModelConfig:
    """Map the reference rt_config (train.py:657-686) onto ModelConfig."""
    kw = dict(
        hidden_size=ref_cfg["hidden_size"],
        intermediate_size=ref_cfg["intermediate_size"],
        lstm_hidden_size=ref_cfg.get("lstm_hidden_size",
                                     ref_cfg["hidden_size"]),
        num_hidden_layers=ref_cfg["num_hidden_layers"],
        num_attention_heads=ref_cfg["num_attention_heads"],
        hidden_dropout_prob=ref_cfg["hidden_dropout_prob"],
        attention_probs_dropout_prob=ref_cfg["attention_probs_dropout_prob"],
        layer_norm_eps=ref_cfg["layer_norm_eps"],
        vocab_size=ref_cfg["vocab_size"],
        word_vec_size=ref_cfg["word_vec_size"],
        action_vocab_size=ref_cfg["action_vocab_size"],
        video_feature_size=ref_cfg["video_feature_size"],
        max_v_len=ref_cfg["max_v_len"],
        max_t_len=ref_cfg["max_t_len"],
        max_i_len=ref_cfg.get("max_i_len", 100),
        model_mode=ref_cfg["model_mode"],
        temperature=ref_cfg.get("temperature", 0.5),
        lambda_=ref_cfg.get("lambda_", 0.5),
        label_smoothing=ref_cfg.get("label_smoothing", 0.1),
        share_wd_cls_weight=ref_cfg.get("share_wd_cls_weight", False),
        # parity numerics for decoding reference checkpoints
        compute_dtype="float32",
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def import_reference_checkpoint(path: str, base_cfg: Config):
    """(Config, flax params) ready for decode/eval from a reference .chkpt."""
    import jax
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.model.import_torch import import_state_dict

    ref_cfg, state = load_torch_checkpoint(path)
    mcfg = model_config_from_reference(
        ref_cfg,
        max_n_sen=base_cfg.model.max_n_sen,
        max_entities=base_cfg.model.max_entities,
        max_oov=base_cfg.model.max_oov,
        max_ingr_words=base_cfg.model.max_ingr_words,
        # keep the caller's tp vocab padding: --tp_size N sets
        # vocab_pad_multiple=N and import_state_dict pads the vocab-axis
        # tables to it; defaulting to 1 here would silently replicate
        # (not shard) the embedding/LM-head tables under tp
        vocab_pad_multiple=base_cfg.model.vocab_pad_multiple)
    cfg = Config(model=mcfg, data=base_cfg.data, train=base_cfg.train)

    model = SVPCModel(cfg.model)
    batch = synthetic_batch(cfg, batch_size=1, seed=0)
    import jax.numpy as jnp
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    abstract = jax.eval_shape(
        lambda: model.init(rngs, jbatch, deterministic=True))
    # materialize zeros for unmapped leaves, then overwrite mapped ones
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
    params = import_state_dict(params, state, cfg.model.model_mode,
                               cfg.model.num_hidden_layers,
                               vocab_size=cfg.model.vocab_size,
                               padded_vocab_size=cfg.model.padded_vocab_size)
    return cfg, model, params
