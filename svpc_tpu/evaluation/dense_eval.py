"""tIoU-based dense-captioning evaluation.

Equivalent of the reference's legacy densevid_eval/evaluate.py (the 2017
ActivityNet dense-caption evaluator; python-2-era and off the main path —
SURVEY §2.2): for each tIoU threshold, every predicted (timestamp,
sentence) is scored against ground-truth segments whose temporal IoU
exceeds the threshold, and sentence metrics are averaged over thresholds.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from svpc_tpu.evaluation.bleu import compute_bleu
from svpc_tpu.evaluation.cider import compute_cider_d
from svpc_tpu.evaluation.para_eval import parse_sent
from svpc_tpu.evaluation.rouge import compute_rouge_l

DEFAULT_TIOUS = (0.3, 0.5, 0.7, 0.9)


def tiou(a: Sequence[float], b: Sequence[float]) -> float:
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union if union > 0 else 0.0


def evaluate_dense_captions(
    predictions: Dict[str, List[dict]],
    references: Dict[str, dict],
    tiou_thresholds: Sequence[float] = DEFAULT_TIOUS,
) -> Dict[str, float]:
    """
    predictions: {vid: [{"sentence", "timestamp"}]}
    references: {vid: {"timestamps": [[s,e]...], "sentences": [...]}}
    Returns Bleu_4 / ROUGE_L / CIDEr averaged over tIoU thresholds, plus
    average recall/precision of the localization matching.
    """
    out: Dict[str, float] = {}
    per_t_scores = []
    recalls, precisions = [], []
    for t in tiou_thresholds:
        gts, res = {}, {}
        idx = 0
        vid_recalls, vid_precisions = [], []
        # reference semantics (evaluate.py:126-157): iterate ALL ground
        # truth videos — a GT video with no predictions scores 0 recall
        # and 0 precision; tIoU comparison is strictly greater-than.
        # recall = covered GT segments / GT count, precision = covered
        # predictions / prediction count, each per video then averaged —
        # a pile of predictions on one GT segment cannot inflate recall.
        for vid, ref in references.items():
            preds = predictions.get(vid, [])
            gt_covered: set = set()
            pred_covered = 0
            for p in preds:
                matches = []
                for ri, (ts, s) in enumerate(zip(ref["timestamps"],
                                                 ref["sentences"])):
                    if tiou(p["timestamp"], ts) > t:
                        gt_covered.add(ri)
                        matches.append(s)
                if matches:
                    pred_covered += 1
                    gts[idx] = [" ".join(parse_sent(m)) for m in matches]
                    res[idx] = [" ".join(parse_sent(p["sentence"]))]
                    idx += 1
            if ref["sentences"]:
                vid_recalls.append(len(gt_covered) / len(ref["sentences"]))
            vid_precisions.append(pred_covered / len(preds) if preds
                                  else 0.0)
        if not gts:
            per_t_scores.append({"Bleu_4": 0.0, "ROUGE_L": 0.0, "CIDEr": 0.0})
            recalls.append(0.0)
            precisions.append(0.0)
            continue
        bleu, _ = compute_bleu(gts, res)
        rouge, _ = compute_rouge_l(gts, res)
        cider, _ = compute_cider_d(gts, res)
        per_t_scores.append(
            {"Bleu_4": bleu[3], "ROUGE_L": rouge, "CIDEr": cider})
        recalls.append(float(np.mean(vid_recalls)) if vid_recalls else 0.0)
        precisions.append(
            float(np.mean(vid_precisions)) if vid_precisions else 0.0)

    for key in ("Bleu_4", "ROUGE_L", "CIDEr"):
        out[key] = float(np.mean([s[key] for s in per_t_scores]))
    out["Recall"] = float(np.mean(recalls))
    out["Precision"] = float(np.mean(precisions))
    for t, s in zip(tiou_thresholds, per_t_scores):
        for key, v in s.items():
            out[f"{key}@tIoU{t}"] = v
    return out


def merge_dicts_by_prefix(paths_and_prefixes: Sequence[Tuple[str, str]],
                          out_path: str) -> dict:
    """Merge metric JSON files, prefixing keys (equivalent of the
    reference's densevid_eval/merge_dicts_by_prefix.py)."""
    import json
    merged = {}
    for path, prefix in paths_and_prefixes:
        with open(path) as f:
            d = json.load(f)
        for k, v in d.items():
            merged[f"{prefix}{k}"] = v
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    return merged
