"""Bridge utilities shared by parity tests: builds matched reference-side
(PyTorch) and framework-side (JAX) models, datasets and batches."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"
TMP = "/tmp/svpc_parity"

# small-but-real geometry: downsampling, truncation and padding all exercised
GEOM = dict(max_v_len=16, max_t_len=10, max_n_sen=12, max_i_len=100)
DIMS = dict(hidden_size=64, intermediate_size=64, lstm_hidden_size=64,
            word_vec_size=32, num_attention_heads=4, num_hidden_layers=2,
            video_feature_size=24)

# the flagship experiment-of-record geometry every BASELINE.md claim is
# stated against (reference src/train.py:471-509 defaults +
# scripts/train.sh:19-21) — used by test_parity_paper.py
PAPER_GEOM = dict(max_v_len=100, max_t_len=22, max_n_sen=12, max_i_len=100)
PAPER_DIMS = dict(hidden_size=768, intermediate_size=768,
                  lstm_hidden_size=768, word_vec_size=300,
                  num_attention_heads=12, num_hidden_layers=2,
                  video_feature_size=3072)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def setup_features(n_videos: int = 4, seed: int = 0, split: str = "val",
                   feat_dims=(16, 8), tag: str = ""):
    """Deterministic synthetic features + duration csv for the first
    n_videos of the split.

    The fixture dir is shared across tests: datasets built from it include
    EVERY video whose features exist (fix_missing semantics), so a test
    requesting more videos than test_parity.N_VIDEOS would leak extras
    into the parity datasets.  Keep n_videos <= 3 in new tests, or pass a
    distinct ``tag`` for an isolated fixture dir (e.g. the paper-geometry
    fixtures with feat_dims=(2048, 1024))."""
    ann_path = os.path.join(
        REFERENCE_ROOT, "densevid_eval/yc2_data",
        {"train": "bosselut_yc2_train_anet_format.json",
         "val": "bosselut_split_yc2_val_anet_format.json",
         "test": "bosselut_split_yc2_test_anet_format.json"}[split])
    anns = json.load(open(ann_path))
    names = list(anns)[:n_videos]
    feat_dir = os.path.join(TMP, f"feat_{split}{tag}")
    dur_file = os.path.join(TMP, f"dur_{split}{tag}.csv")
    os.makedirs(TMP, exist_ok=True)
    if not all(os.path.exists(os.path.join(feat_dir, f"{n}_resnet.npy"))
               for n in names):
        _make_small_features(names, feat_dir, dur_file, anns, seed,
                             feat_dims)
    return names, feat_dir, dur_file


def _make_small_features(names, feat_dir, dur_file, anns, seed,
                         feat_dims=(16, 8)):
    import math
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = []
    for name in names:
        duration = float(anns[name]["duration"])
        n_frames = int(duration * 30)
        frm2sec = duration * math.ceil(n_frames / duration * 0.5) / n_frames
        feat_len = max(int(math.ceil(duration / frm2sec)) + 2, 8)
        np.save(os.path.join(feat_dir, f"{name}_resnet.npy"),
                rng.randn(feat_len, feat_dims[0]).astype(np.float32))
        np.save(os.path.join(feat_dir, f"{name}_bn.npy"),
                rng.randn(feat_len, feat_dims[1]).astype(np.float32))
        lines.append(f"{name},{duration},{n_frames}\n")
    with open(dur_file, "w") as f:
        f.writelines(lines)


def build_reference(model_mode: str, feat_dir: str, dur_file: str,
                    seed: int = 7, geom=None, dims=None):
    """Returns (torch model in eval(), reference dataset, rt cfg)."""
    from tools.reference_harness import (
        install_patches, make_reference_config, make_reference_dataset)
    install_patches()
    import torch
    from src.rtransformer.model import StateAwareRecursiveTransformer

    geom = geom or GEOM
    dims = dims or DIMS
    w2i = json.load(open(os.path.join(REFERENCE_ROOT, "cache/yc2_word2idx.json")))
    v2i = json.load(open(os.path.join(REFERENCE_ROOT,
                                      "cache/bosselut_verb_vocab.json")))
    cfg = make_reference_config(
        model_mode, len(w2i), len(v2i),
        max_n_sen=geom["max_n_sen"], max_t_len=geom["max_t_len"],
        max_v_len=geom["max_v_len"])
    for k, v in dims.items():
        cfg[k] = v
    cfg["max_position_embeddings"] = geom["max_v_len"] + geom["max_t_len"]

    torch.manual_seed(seed)
    model = StateAwareRecursiveTransformer(cfg)
    if model_mode in ("full", "reason_copy"):
        rng = np.random.RandomState(seed)
        verb_emb = torch.from_numpy(
            rng.randn(len(v2i), dims["word_vec_size"]).astype(np.float32))
        model.reasoner.set_pretrained_embedding(verb_emb, freeze=False)
        if model_mode == "full":
            model.recipe_reasoner.set_pretrained_embedding(
                verb_emb.clone(), freeze=False)
    model.eval()

    ds = make_reference_dataset(
        feat_dir, dur_file, split="val", max_n_sen=geom["max_n_sen"],
        max_t_len=geom["max_t_len"], max_v_len=geom["max_v_len"],
        max_i_len=geom["max_i_len"])
    return model, ds, cfg


def build_ours(model_mode: str, feat_dir: str, dur_file: str,
               geom=None, dims=None):
    """Returns (Config, CaptionDataset)."""
    from svpc_tpu.config import Config, DataConfig, ModelConfig
    from svpc_tpu.data.pipeline import CaptionDataset

    geom = geom or GEOM
    dims = dims or DIMS
    w2i = json.load(open(os.path.join(REFERENCE_ROOT, "cache/yc2_word2idx.json")))
    v2i = json.load(open(os.path.join(REFERENCE_ROOT,
                                      "cache/bosselut_verb_vocab.json")))
    mcfg = ModelConfig(
        vocab_size=len(w2i), action_vocab_size=len(v2i),
        model_mode=model_mode, max_entities=32, max_oov=16, max_ingr_words=8,
        **geom, **dims)
    cfg = Config(
        model=mcfg,
        data=DataConfig(
            data_dir=os.path.join(REFERENCE_ROOT, "densevid_eval/yc2_data"),
            video_feature_dir=feat_dir, duration_file=dur_file,
            word2idx_path=os.path.join(REFERENCE_ROOT, "cache/yc2_word2idx.json"),
            verb2idx_path=os.path.join(REFERENCE_ROOT,
                                       "cache/bosselut_verb_vocab.json")))
    ds = CaptionDataset(cfg, "val", num_steps=geom["max_n_sen"])
    return cfg, ds


def reference_batch(ds, indices):
    """Collate reference examples the reference way; returns the model
    input lists (train.py:91-111 equivalent)."""
    import torch
    from src.rtransformer.recursive_caption_dataset import caption_collate
    raw = caption_collate([ds[i] for i in indices])
    step_batches, step_sizes, metas, ingr, aligns, actions = raw
    inputs = dict(
        input_ids_list=[torch.as_tensor(b["input_ids"]) for b in step_batches],
        video_features_list=[b["video_feature"].float() for b in step_batches],
        input_masks_list=[b["input_mask"].float() for b in step_batches],
        token_type_ids_list=[torch.as_tensor(b["token_type_ids"]) for b in step_batches],
        input_labels_list=[torch.as_tensor(b["input_labels"]) for b in step_batches],
        ingr_input_ids=torch.LongTensor([e["ingr_ids"] for e in ingr]),
        ingr_masks=torch.LongTensor([e["ingr_mask"] for e in ingr]),
        ingr_sep_masks=torch.LongTensor([e["ingr_sep_mask"] for e in ingr]),
        batch_step_num=step_sizes,
        ingr_id_dict=[e["ingr_id_dict"] for e in ingr],
        extra_zeros=[len(e["oov_word_dict"]) for e in ingr],
        alignments=[a for a in aligns],
        actions=[a for a in actions],
    )
    return inputs, metas, ingr


def import_weights_into(cfg, torch_model, batch_np):
    """Init our model and overwrite params with the reference state_dict."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.model.import_torch import import_state_dict

    model = SVPCModel(cfg.model)
    jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, jbatch, deterministic=True)
    state = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = import_state_dict(params, state, cfg.model.model_mode,
                               cfg.model.num_hidden_layers,
                               vocab_size=cfg.model.vocab_size,
                               padded_vocab_size=cfg.model.padded_vocab_size)
    return model, params, jbatch


def patch_deterministic_gumbel():
    """Replace gumbel sampling with zero noise on both sides so the
    re-simulation path is comparable."""
    import torch
    import torch.nn.functional as F

    def det_gumbel(logits, tau=1.0, hard=False, dim=-1):
        y_soft = (logits / tau).softmax(dim)
        if hard:
            index = y_soft.max(dim, keepdim=True)[1]
            y_hard = torch.zeros_like(logits).scatter_(dim, index, 1.0)
            return y_hard - y_soft.detach() + y_soft
        return y_soft

    F.gumbel_softmax = det_gumbel
    import src.rtransformer.model as ref_model
    ref_model.F.gumbel_softmax = det_gumbel

    import jax
    import jax.numpy as jnp
    import svpc_tpu.model.svpc as svpc_mod

    def det_gumbel_jax(key, logits, tau, axis=-1):
        y_soft = jax.nn.softmax(logits / tau, axis=axis)
        index = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(index, logits.shape[axis],
                                dtype=logits.dtype, axis=axis)
        return y_hard + y_soft - jax.lax.stop_gradient(y_soft)

    svpc_mod.gumbel_softmax_st = det_gumbel_jax
