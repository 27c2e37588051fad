"""Harness to run the PyTorch reference (/root/reference) on CPU.

Used ONLY to generate golden fixtures (weights, forward losses, greedy
tokens) and baseline throughput numbers — no reference code is copied into
the framework.

The reference hard-codes ``.cuda()`` everywhere and imports packages absent
here (easydict) plus nltk punkt data (absent, zero egress); this harness
monkeypatches all of that before import.
"""

from __future__ import annotations

import json
import math
import os
import sys
import types

import numpy as np

REFERENCE_ROOT = os.environ.get("SVPC_REFERENCE", "/root/reference")


class _EasyDict(dict):
    """Picklable easydict.EasyDict stand-in (module-level so torch.save
    of reference checkpoints works)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = v

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __reduce__(self):
        return (dict, (dict(self),))


def install_patches():
    # numpy removed np.int; the reference uses it (recursive_caption_dataset.py:404)
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]

    # easydict stub
    if "easydict" not in sys.modules:
        mod = types.ModuleType("easydict")
        mod.EasyDict = _EasyDict
        sys.modules["easydict"] = mod

    import torch

    # .cuda() no-ops so the reference runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # nltk punkt data is unavailable; word_tokenize -> Treebank (equivalent
    # on this corpus: no sentence-internal punctuation anywhere)
    import nltk
    from nltk.tokenize.treebank import TreebankWordTokenizer
    _tb = TreebankWordTokenizer()
    nltk.tokenize.word_tokenize = lambda s: _tb.tokenize(s)
    nltk.word_tokenize = nltk.tokenize.word_tokenize

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def make_synthetic_features(video_names, feature_dir, duration_file,
                            annotations, seed=0):
    """Create random .npy features + a duration CSV consistent with the
    annotations' timestamps."""
    os.makedirs(feature_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = []
    for name in video_names:
        ann = annotations[name]
        duration = float(ann["duration"])
        # pick fps ~ 30 so frame count is plausible
        n_frames = int(duration * 30)
        # yc2 math: frm2sec = dur * ceil(frames/dur*0.5) / frames
        frm2sec = duration * math.ceil(n_frames / duration * 0.5) / n_frames
        feat_len = max(int(math.ceil(duration / frm2sec)) + 2, 8)
        resnet = rng.randn(feat_len, 2048).astype(np.float32)
        bn = rng.randn(feat_len, 1024).astype(np.float32)
        np.save(os.path.join(feature_dir, f"{name}_resnet.npy"), resnet)
        np.save(os.path.join(feature_dir, f"{name}_bn.npy"), bn)
        lines.append(f"{name},{duration},{n_frames}\n")
    with open(duration_file, "w") as f:
        f.writelines(lines)


def make_reference_config(model_mode: str, vocab_size: int,
                          action_vocab_size: int, max_n_sen: int = 12,
                          max_t_len: int = 22, max_v_len: int = 100):
    from easydict import EasyDict as EDict
    return EDict(
        xl_grad=False,
        hidden_size=768, intermediate_size=768, vocab_size=vocab_size,
        word_vec_size=300, action_vocab_size=action_vocab_size,
        lstm_hidden_size=768, video_feature_size=3072,
        max_position_embeddings=max_v_len + max_t_len,
        max_v_len=max_v_len, max_t_len=max_t_len, max_i_len=100,
        use_asl="asl", model_mode=model_mode, temperature=0.5, lambda_=0.5,
        type_vocab_size=4, unk_id=6, layer_norm_eps=1e-12,
        hidden_dropout_prob=0.1, num_hidden_layers=2, num_attention_heads=12,
        attention_probs_dropout_prob=0.1, n_memory_cells=1,
        memory_dropout_prob=0.1, initializer_range=0.02,
        label_smoothing=0.1, share_wd_cls_weight=False,
    )


def build_reference_model(model_mode: str, seed: int = 2019,
                          load_glove: bool = True, **cfg_kw):
    install_patches()
    import torch
    from src.rtransformer.model import StateAwareRecursiveTransformer

    w2i = json.load(open(os.path.join(REFERENCE_ROOT, "cache/yc2_word2idx.json")))
    v2i = json.load(open(os.path.join(REFERENCE_ROOT, "cache/bosselut_verb_vocab.json")))
    cfg = make_reference_config(model_mode, len(w2i), len(v2i), **cfg_kw)

    torch.manual_seed(seed)
    model = StateAwareRecursiveTransformer(cfg)
    if load_glove:
        glove = torch.from_numpy(
            torch.load(os.path.join(REFERENCE_ROOT, "cache/yc2_vocab_glove.pt"),
                       weights_only=False)).float()
        model.ingredient_embeddings.set_pretrained_embedding(glove, freeze=False)
        model.text_embeddings.set_pretrained_embedding(glove, freeze=False)
        if model_mode in ("full", "reason_copy"):
            verb_glove = torch.from_numpy(
                torch.load(os.path.join(REFERENCE_ROOT,
                                        "cache/bosselut_yc2_verb_vocab_glove.pt"),
                           weights_only=False)).float()
            model.reasoner.set_pretrained_embedding(verb_glove, freeze=False)
            if model_mode == "full":
                model.recipe_reasoner.set_pretrained_embedding(
                    verb_glove, freeze=False)
    model.eval()
    return model, cfg


def make_reference_dataset(feature_dir: str, duration_file: str,
                           split: str = "val", max_n_sen: int = 12,
                           max_t_len: int = 22, max_v_len: int = 100,
                           max_i_len: int = 100):
    install_patches()
    from src.rtransformer.recursive_caption_dataset import RecursiveCaptionDataset
    return RecursiveCaptionDataset(
        dset_name="yc2",
        data_dir=os.path.join(REFERENCE_ROOT, "densevid_eval/yc2_data"),
        video_feature_dir=feature_dir,
        duration_file=duration_file,
        word2idx_path=os.path.join(REFERENCE_ROOT, "cache/yc2_word2idx.json"),
        verb_word2idx_path=os.path.join(REFERENCE_ROOT,
                                        "cache/bosselut_verb_vocab.json"),
        max_t_len=max_t_len, max_v_len=max_v_len, max_i_len=max_i_len,
        max_n_sen=max_n_sen, mode=split, recurrent=True, untied=False)


def state_dict_to_npz(model, path: str):
    import torch
    arrays = {}
    for k, v in model.state_dict().items():
        arrays[k] = v.detach().cpu().numpy()
    np.savez(path, **arrays)
    return arrays
