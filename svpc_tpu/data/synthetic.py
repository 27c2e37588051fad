"""Synthetic fixed-shape batches (benchmarks, compile checks, tests)."""

from __future__ import annotations

import numpy as np

from svpc_tpu import tokenization as tok
from svpc_tpu.config import Config


def synthetic_batch(cfg: Config, batch_size: int = 2, seed: int = 0,
                    num_steps: int | None = None,
                    full_steps: bool = False) -> dict:
    """Random but structurally valid fixed-shape batch.

    ``full_steps=True`` gives every example the maximum step count —
    deterministic work content for benchmarking.
    """
    m = cfg.model
    rng = np.random.RandomState(seed)
    S = num_steps or m.max_n_sen
    L = m.max_v_len + m.max_t_len
    Lv, Lt = m.max_v_len, m.max_t_len
    B = batch_size
    V = m.vocab_size

    batch = dict(
        input_ids=np.zeros((B, S, L), np.int32),
        input_labels=np.full((B, S, L), tok.IGNORE, np.int32),
        input_mask=np.zeros((B, S, L), np.float32),
        token_type_ids=np.zeros((B, S, L), np.int32),
        video_feature=np.zeros((B, S, Lv, m.video_feature_size), np.float32),
        step_mask=np.zeros((B, S), np.float32),
        ingr_ids=np.zeros((B, m.max_i_len), np.int32),
        ingr_mask=np.zeros((B, m.max_i_len), np.int32),
        ingr_sep_mask=np.zeros((B, m.max_i_len), np.int32),
        entity_mask=np.zeros((B, m.max_entities), np.float32),
        copy_ids=np.zeros((B, m.max_entities, m.max_ingr_words), np.int32),
        copy_weights=np.zeros((B, m.max_entities, m.max_ingr_words), np.float32),
        oov_count=np.zeros((B,), np.int32),
        alignment=np.zeros((B, S, m.max_entities), np.float32),
        action=np.zeros((B, S, m.action_vocab_size), np.float32),
        action_row_mask=np.zeros((B, S), np.float32),
    )

    for b in range(B):
        n_steps = S if full_steps else rng.randint(1, S + 1)
        batch["step_mask"][b, :n_steps] = 1.0
        for s in range(n_steps):
            v_valid = Lv - 2 if full_steps else rng.randint(1, Lv - 1)
            ids_v = [tok.CLS] + [tok.VID] * v_valid + [tok.SEP] \
                + [tok.PAD] * (Lv - 2 - v_valid)
            n_words = Lt - 2 if full_steps else rng.randint(1, Lt - 1)
            words = rng.randint(7, V, size=n_words).tolist()
            ids_t = ([tok.BOS] + words + [tok.EOS]
                     + [tok.PAD] * (Lt - 2 - n_words))
            batch["input_ids"][b, s] = ids_v + ids_t
            batch["input_mask"][b, s, :v_valid + 2] = 1
            batch["input_mask"][b, s, Lv:Lv + n_words + 2] = 1
            labels = [tok.IGNORE] * Lv + words + [tok.EOS] \
                + [tok.IGNORE] * (Lt - 1 - n_words)
            batch["input_labels"][b, s] = labels
            batch["token_type_ids"][b, s, Lv:] = 1
            batch["video_feature"][b, s, 1:v_valid + 1] = rng.randn(
                v_valid, m.video_feature_size).astype(np.float32)

        n_ent = (m.max_entities if full_steps
                 else rng.randint(1, m.max_entities + 1))
        pos = 0
        oov = 0
        for e in range(n_ent):
            n_w = rng.randint(1, min(2, m.max_ingr_words) + 1)
            if pos + n_w + 1 > m.max_i_len:
                break
            group = []
            for w in range(n_w):
                if oov < m.max_oov and rng.rand() < 0.2:
                    wid = V + oov
                    batch["ingr_ids"][b, pos] = tok.UNK
                    oov += 1
                else:
                    wid = int(rng.randint(7, V))
                    batch["ingr_ids"][b, pos] = wid
                group.append(wid)
                pos += 1
            batch["ingr_ids"][b, pos] = tok.SEP
            batch["ingr_sep_mask"][b, pos] = 1
            pos += 1
            batch["entity_mask"][b, e] = 1.0
            for k, wid in enumerate(group):
                batch["copy_ids"][b, e, k] = wid
                batch["copy_weights"][b, e, k] = 1.0 / len(group)
        batch["ingr_mask"][b, :pos] = 1
        batch["oov_count"][b] = oov

        n_ent_actual = int(batch["entity_mask"][b].sum())
        batch["alignment"][b, :n_steps, :n_ent_actual] = (
            rng.rand(n_steps, n_ent_actual) < 0.3).astype(np.float32)
        acts = (rng.rand(n_steps, m.action_vocab_size) < 0.05).astype(np.float32)
        batch["action"][b, :n_steps] = acts
        batch["action_row_mask"][b] = (
            batch["action"][b].sum(-1) > 0).astype(np.float32) \
            * batch["step_mask"][b]
    return batch


def apply_step_counts(batch: dict, step_counts) -> float:
    """Restrict a synthetic batch to the given per-video real step counts
    (tiled to the batch size) — reproduces a measured workload's clip
    distribution so clips/sec counts identical real work.  Returns the
    total real clip count."""
    B = batch["step_mask"].shape[0]
    counts = (list(step_counts) * (B // len(step_counts) + 1))[:B]
    for b, c in enumerate(counts):
        batch["step_mask"][b] = 0.0
        batch["step_mask"][b, :c] = 1.0
    return float(batch["step_mask"].sum())
