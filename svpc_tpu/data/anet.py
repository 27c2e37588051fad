"""ActivityNet-format annotation + duration handling for YC2.

Reproduces the reference's schema reading and timestamp→feature-index math
(reference: src/rtransformer/recursive_caption_dataset.py:112-169, 379-387).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Tuple

SPLIT_FILES = {
    "train": "bosselut_yc2_train_anet_format.json",
    "val": "bosselut_split_yc2_val_anet_format.json",
    "test": "bosselut_split_yc2_test_anet_format.json",
}

PARA_REFERENCE_FILES = {
    "val": "yc2_split_val_anet_format_para.json",
    "test": "yc2_split_test_anet_format_para.json",
}

# anet carries TWO human reference paragraphs per split; scorers consume
# them as a multi-reference list (reference: src/test.py:87-93).
ANET_PARA_REFERENCE_FILES = {
    "val": ["anet_entities_val_1_para.json", "anet_entities_val_2_para.json"],
    "test": ["anet_entities_test_1_para.json",
             "anet_entities_test_2_para.json"],
}


def para_reference_files(dset_name: str, split: str) -> List[str]:
    """Paragraph ground-truth files for a split (reference
    src/test.py:85-94: 2 files for anet, 1 for yc2; none for train)."""
    if dset_name == "anet":
        return list(ANET_PARA_REFERENCE_FILES.get(split, []))
    f = PARA_REFERENCE_FILES.get(split)
    return [f] if f else []


def load_annotations(data_dir: str, split: str, max_n_sen: int) -> List[dict]:
    """Load one split; truncate each video to ``max_n_sen`` clips
    (reference: recursive_caption_dataset.py:136-169)."""
    if split not in SPLIT_FILES:
        raise ValueError(f"split must be one of {sorted(SPLIT_FILES)}, got {split}")
    path = os.path.join(data_dir, SPLIT_FILES[split])
    with open(path) as f:
        raw = json.load(f)
    data = []
    for name, line in raw.items():
        line = dict(line)
        line["name"] = name
        line["timestamps"] = line["timestamps"][:max_n_sen]
        line["sentences"] = line["sentences"][:max_n_sen]
        data.append(line)
    return data


def video_feature_name(name: str, dset_name: str) -> str:
    """Annotation id -> feature-file stem: anet ids carry a "v_" prefix
    the feature files drop (recursive_caption_dataset.py:98,186)."""
    return name[2:] if dset_name == "anet" else name


def duration_to_frm2sec(vid_dur: float, vid_frame: float,
                        dset_name: str = "yc2",
                        sampling_sec: float = 0.5) -> float:
    """One duration-CSV row -> seconds per feature frame.

    Matches the reference's math exactly
    (recursive_caption_dataset.py:126-131):
      yc2:  dur * ceil(frames / dur * 0.5) / frames
      anet: dur * int(frames / int(dur) * 0.5) / frames
    """
    if dset_name == "yc2":
        return float(vid_dur) * math.ceil(
            float(vid_frame) * 1. / float(vid_dur) * sampling_sec
        ) * 1. / float(vid_frame)
    if dset_name == "anet":
        return float(vid_dur) * int(
            float(vid_frame) * 1. / int(float(vid_dur)) * sampling_sec
        ) * 1. / float(vid_frame)
    raise NotImplementedError(f"unsupported dataset {dset_name}")


def load_durations(duration_file: str, dset_name: str = "yc2",
                   sampling_sec: float = 0.5) -> Dict[str, float]:
    """duration CSV -> seconds-per-feature-frame map."""
    frame_to_second = {}
    with open(duration_file) as f:
        for line in f:
            vid_name, vid_dur, vid_frame = [l.strip() for l in line.split(",")]
            frame_to_second[vid_name] = duration_to_frm2sec(
                vid_dur, vid_frame, dset_name, sampling_sec)
    if dset_name == "anet":
        frame_to_second["_0CqozZun3U"] = sampling_sec
    return frame_to_second


def timestamp_to_feature_span(
    feat_len: int, timestamp: Tuple[float, float], frm2sec: float
) -> Tuple[int, int]:
    """Wall-clock [start, end] -> inclusive feature index span
    (reference: recursive_caption_dataset.py:379-387)."""
    st = int(math.floor(timestamp[0] / frm2sec))
    ed = int(math.ceil(timestamp[1] / frm2sec))
    ed = min(ed, feat_len - 1)
    # the reference's min(st, ed-1) quirk makes st = -1 whenever ed == 0
    # (a [0, 0] serving timestamp, or a 1-row uploaded feature file) —
    # row -1 is an out-of-bounds read in the native packer.  Annotated
    # splits never produce ed == 0, so the >=0 clamp is parity-neutral.
    st = max(min(st, ed - 1), 0)
    assert 0 <= st <= ed <= feat_len, \
        f"0 <= st {st} <= ed {ed} <= feat_len {feat_len}"
    return st, ed
