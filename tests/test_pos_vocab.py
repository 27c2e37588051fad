"""POS vocab builder: output schema must match the reference's shipped
artifacts (cache/pos_vocab_word2idx.json + the 'pos' field in the anet
annotation files) even though no real tagger data exists on this host —
a deterministic stub tagger exercises the full build/attach path
(round-1 VERDICT weak item 8: only the error path had ever run)."""

import json
import subprocess
import sys

import numpy as np
import pytest

REF_VOCAB = "/root/reference/cache/pos_vocab_word2idx.json"
REF_TRAIN = ("/root/reference/densevid_eval/yc2_data/"
             "bosselut_yc2_train_anet_format.json")


def stub_tagger(sentence):
    """Deterministic rule tagger: words ending in a vowel are NOUN, words
    starting with a-m are VERB, rest untagged-class."""
    out = []
    for w in sentence.split():
        if w[-1] in "aeiou":
            out.append((w, "NOUN"))
        elif w[0] in "abcdefghijklm":
            out.append((w, "VERB"))
        else:
            out.append((w, "DET"))
    return out


def test_vocab_schema_matches_shipped():
    """ids from 0 in first-seen order, no special tokens — the shipped
    cache's exact invariants."""
    from svpc_tpu.cli.build_pos_vocab import build_pos_vocab

    anns = {
        "v1": {"sentences": ["mix the tomato paste", "stir until done"]},
        "v2": {"sentences": ["mix again with tomato"]},
    }
    w2i = build_pos_vocab(anns, stub_tagger)
    # first-seen order under the stub rules: mix(VERB), the(NOUN: ends
    # 'e'), tomato(NOUN), paste(NOUN), stir/until(DET: skipped),
    # done(NOUN), again(VERB), with(DET: skipped)
    assert list(w2i) == ["mix", "the", "tomato", "paste", "done", "again"]
    assert list(w2i.values()) == list(range(len(w2i)))
    assert "[PAD]" not in w2i and "[UNK]" not in w2i

    shipped = json.load(open(REF_VOCAB))
    assert sorted(shipped.values()) == list(range(len(shipped)))
    assert "[PAD]" not in shipped and "[UNK]" not in shipped


def test_attach_pos_schema_matches_shipped():
    """val['pos'] is a per-step list of vocab-filtered word lists — the
    exact structure carried by the shipped annotation files."""
    from svpc_tpu.cli.build_pos_vocab import attach_pos, build_pos_vocab

    anns = {
        "v1": {"sentences": ["mix the tomato paste", "xyz xyz xyz"],
               "duration": 1.0},
    }
    w2i = build_pos_vocab(anns, stub_tagger)
    out = attach_pos(anns, w2i, stub_tagger)
    assert out["v1"]["pos"] == [["mix", "the", "tomato", "paste"], []]
    assert len(out["v1"]["pos"]) == len(out["v1"]["sentences"])

    shipped = json.load(open(REF_TRAIN))
    vid = next(iter(shipped))
    ann = shipped[vid]
    assert isinstance(ann["pos"], list)
    assert len(ann["pos"]) == len(ann["sentences"])
    assert all(isinstance(step, list) for step in ann["pos"])
    shipped_vocab = json.load(open(REF_VOCAB))
    assert all(w in shipped_vocab for step in ann["pos"] for w in step)


def test_cli_end_to_end_with_stub(tmp_path, monkeypatch):
    """Drive the CLI main() with the stub tagger injected: vocab +
    pos-annotated copies written with the reference names/schema."""
    import svpc_tpu.cli.build_pos_vocab as bpv

    train = {"v1": {"sentences": ["mix the tomato paste"], "duration": 1.0}}
    val = {"v9": {"sentences": ["mix tomato"], "duration": 2.0}}
    tp = tmp_path / "train.json"
    vp = tmp_path / "val.json"
    tp.write_text(json.dumps(train))
    vp.write_text(json.dumps(val))
    cache = tmp_path / "cache"

    monkeypatch.setattr(bpv, "spacy_tagger", lambda: stub_tagger)
    monkeypatch.setattr(sys, "argv", [
        "build_pos_vocab", "--train_path", str(tp), "--attach", str(vp),
        "--cache", str(cache)])
    bpv.main()

    w2i = json.load(open(cache / "pos_vocab_word2idx.json"))
    assert w2i == {"mix": 0, "the": 1, "tomato": 2, "paste": 3}
    out_train = json.load(open(cache / "train.json"))
    assert out_train["v1"]["pos"] == [["mix", "the", "tomato", "paste"]]
    out_val = json.load(open(cache / "val.json"))
    assert out_val["v9"]["pos"] == [["mix", "tomato"]]
    # inputs untouched (unlike the reference, which overwrites in place)
    assert "pos" not in json.loads(tp.read_text())["v1"]


def test_cli_degrades_without_tagger(tmp_path, monkeypatch):
    import svpc_tpu.cli.build_pos_vocab as bpv

    tp = tmp_path / "train.json"
    tp.write_text(json.dumps({"v": {"sentences": ["a"]}}))
    monkeypatch.setattr(bpv, "spacy_tagger", lambda: None)
    monkeypatch.setattr(bpv, "nltk_tagger", lambda: None)
    monkeypatch.setattr(sys, "argv",
                        ["build_pos_vocab", "--train_path", str(tp)])
    with pytest.raises(SystemExit, match="no POS tagger"):
        bpv.main()
