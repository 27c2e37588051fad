"""Derive the METEOR fallback's function-word list per the 1.5 rule.

METEOR 1.5 builds its ``function/en.words`` inventory from corpus
statistics: every token whose RELATIVE CORPUS FREQUENCY exceeds 1e-3 is a
function word (Denkowski & Lavie 2014, §"Parameters: function words").
The jar ships a list derived from large monolingual news corpora, which
are not present here (no network egress); this tool applies the same rule
to the in-repo corpus the metric actually scores — the YC2 training
captions (reference densevid_eval/yc2_data) — preprocessed with the SAME
``parse_sent`` normalization the eval pipeline feeds the scorer
(evaluation/para_eval.py: strip non-alphabetic, lowercase, split), so
membership tests run on exactly the token alphabet the scorer sees.

Regenerates ``svpc_tpu/evaluation/data/function_words.txt`` (checked in,
pinned by tests/test_metrics.py).  Run:

    python tools/derive_function_words.py [--train_path P] [--out P]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TRAIN = ("/root/reference/densevid_eval/yc2_data/"
                 "bosselut_yc2_train_anet_format.json")
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "svpc_tpu", "evaluation", "data", "function_words.txt")
THRESHOLD = 1e-3  # METEOR 1.5: relative corpus frequency > 1e-3


def derive(train_path: str, threshold: float = THRESHOLD):
    from svpc_tpu.evaluation.para_eval import parse_sent

    with open(train_path) as f:
        anns = json.load(f)
    counts: Counter = Counter()
    for video in anns.values():
        for sent in video["sentences"]:
            counts.update(parse_sent(sent))
    total = sum(counts.values())
    words = sorted(w for w, c in counts.items() if c / total > threshold)
    return words, total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_path", default=DEFAULT_TRAIN)
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--threshold", type=float, default=THRESHOLD)
    args = ap.parse_args()

    words, total = derive(args.train_path, args.threshold)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# METEOR function words: relative corpus frequency > "
                f"{args.threshold:g}\n"
                "# corpus: YC2 training captions "
                f"({os.path.basename(args.train_path)}, {total} tokens, "
                "parse_sent-normalized)\n"
                "# regenerate: python tools/derive_function_words.py\n")
        f.write("\n".join(words) + "\n")
    print(f"{len(words)} function words -> {args.out}")


if __name__ == "__main__":
    main()
