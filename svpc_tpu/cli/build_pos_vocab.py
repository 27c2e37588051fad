"""POS/verb vocabulary builder (reference: src/build_pos_vocab.py +
cache/pos_vocab_word2idx.json).

The reference runs spaCy offline with hard-coded author paths
(build_pos_vocab.py:51) to (a) build a VERB/NOUN vocabulary from training
sentences and (b) attach per-step ``pos`` annotations.  This CLI does the
same with a pluggable tagger: spaCy when an en model is installed,
otherwise nltk's perceptron tagger when its data is present; it degrades
with a clear message otherwise (both need downloadable model data, which
an air-gapped host may not have — the shipped cache/pos_vocab_word2idx.json
from the reference remains usable as-is).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, List, Optional, Tuple

from svpc_tpu.tokenization import word_tokenize


def spacy_tagger() -> Optional[Callable[[str], List[Tuple[str, str]]]]:
    try:
        import spacy
        nlp = spacy.load("en_core_web_sm", disable=["parser", "ner"])
    except Exception:
        return None

    def tag(sentence: str):
        return [(t.text, t.pos_) for t in nlp(sentence)]
    return tag


def nltk_tagger() -> Optional[Callable[[str], List[Tuple[str, str]]]]:
    try:
        import nltk
        nltk.pos_tag(["test"])  # raises if tagger data is missing
    except Exception:
        return None
    import nltk

    def to_universal(ptb: str) -> str:
        if ptb.startswith("VB"):
            return "VERB"
        if ptb.startswith("NN"):
            return "NOUN"
        return ptb

    def tag(sentence: str):
        toks = word_tokenize(sentence)
        return [(w, to_universal(t)) for w, t in nltk.pos_tag(toks)]
    return tag


def build_pos_vocab(annotations: dict, tag) -> Tuple[dict, dict]:
    """Returns (pos word2idx over VERB/NOUN tokens, per-video pos lists)."""
    word2idx = {"[PAD]": 0, "[UNK]": 1}
    pos_annotations = {}
    for vid, ann in annotations.items():
        vid_pos = []
        for sentence in ann["sentences"]:
            tags = tag(sentence.lower())
            step = [(w, p) for w, p in tags if p in ("VERB", "NOUN")]
            for w, p in step:
                if w not in word2idx:
                    word2idx[w] = len(word2idx)
            vid_pos.append(step)
        pos_annotations[vid] = vid_pos
    return word2idx, pos_annotations


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_path", required=True)
    p.add_argument("--cache", default="./cache")
    p.add_argument("--dset_name", default="yc2")
    args = p.parse_args()

    tagger = spacy_tagger() or nltk_tagger()
    if tagger is None:
        raise SystemExit(
            "no POS tagger available: install spacy en_core_web_sm or nltk "
            "averaged_perceptron_tagger data.  (The reference's published "
            "cache/pos_vocab_word2idx.json can be used directly instead.)")

    with open(args.train_path) as f:
        annotations = json.load(f)
    word2idx, pos_annotations = build_pos_vocab(annotations, tagger)
    os.makedirs(args.cache, exist_ok=True)
    out = os.path.join(args.cache, "pos_vocab_word2idx.json")
    with open(out, "w") as f:
        json.dump(word2idx, f, indent=2)
    pos_out = os.path.join(args.cache, f"{args.dset_name}_pos_annotations.json")
    with open(pos_out, "w") as f:
        json.dump(pos_annotations, f)
    print(f"pos vocab size {len(word2idx)} -> {out}")


if __name__ == "__main__":
    main()
