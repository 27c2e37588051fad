"""METEOR.

The reference scores METEOR through pycocoevalcap's Java meteor-1.5.jar
(densevid_eval/para-evaluate.py via the coco-caption submodule — which is
EMPTY in the reference checkout, so the jar must be supplied externally
there too).  Two backends:

  * ``JarMeteor``: byte-identical scoring by shelling out to the same jar
    when one is available (set SVPC_METEOR_JAR or place meteor-1.5.jar
    next to this file);
  * ``approximate_meteor``: a documented pure-python approximation
    (exact + Porter-stem matching, METEOR 1.0 parameters) used when no
    jar/JVM exists.  Clearly labeled: parity claims apply only to the jar
    backend.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
from typing import Dict, List, Tuple

METEOR_JAR = os.environ.get(
    "SVPC_METEOR_JAR",
    os.path.join(os.path.dirname(__file__), "meteor-1.5.jar"))


def jar_available() -> bool:
    return os.path.exists(METEOR_JAR) and shutil.which("java") is not None


class JarMeteor:
    """Wrapper for meteor-1.5.jar (same protocol as pycocoevalcap)."""

    def __init__(self):
        self.proc = subprocess.Popen(
            ["java", "-jar", "-Xmx2G", METEOR_JAR, "-", "-", "-stdio",
             "-l", "en", "-norm"],
            cwd=os.path.dirname(os.path.abspath(METEOR_JAR)),
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            universal_newlines=True, bufsize=1)
        self.lock = threading.Lock()

    def compute_score(self, gts: Dict, res: Dict) -> Tuple[float, List[float]]:
        ids = sorted(gts.keys(), key=str)
        scores = []
        eval_line = "EVAL"
        with self.lock:
            for i in ids:
                stat = self._stat(res[i][0], gts[i])
                eval_line += " ||| {}".format(stat)
            self.proc.stdin.write(eval_line + "\n")
            for _ in ids:
                scores.append(float(self.proc.stdout.readline().strip()))
            final = float(self.proc.stdout.readline().strip())
        return final, scores

    def _stat(self, hypothesis: str, references: List[str]) -> str:
        hypothesis = hypothesis.replace("|||", "").replace("  ", " ")
        score_line = " ||| ".join(
            ("SCORE", " ||| ".join(references), hypothesis))
        self.proc.stdin.write(score_line + "\n")
        return self.proc.stdout.readline().strip()


try:
    from nltk.stem.porter import PorterStemmer
    _STEMMER = PorterStemmer()
except Exception:  # pragma: no cover
    _STEMMER = None


def _porter_stem(word: str) -> str:
    # without nltk the stem stage degrades to exact matching (the
    # approximation is already labeled non-identical); never crash eval
    return _STEMMER.stem(word) if _STEMMER is not None else word


def _align(hyp: List[str], ref: List[str]) -> Tuple[int, int]:
    """Greedy two-stage alignment: exact, then stem matches.
    Returns (#matches, #chunks)."""
    matched_h = [-1] * len(hyp)
    used_r = [False] * len(ref)
    for stage in ("exact", "stem"):
        for i, hw in enumerate(hyp):
            if matched_h[i] >= 0:
                continue
            key_h = hw if stage == "exact" else _porter_stem(hw)
            for j, rw in enumerate(ref):
                if used_r[j]:
                    continue
                key_r = rw if stage == "exact" else _porter_stem(rw)
                if key_h == key_r:
                    matched_h[i] = j
                    used_r[j] = True
                    break
    pairs = [(i, j) for i, j in enumerate(matched_h) if j >= 0]
    m = len(pairs)
    chunks = 0
    prev = None
    for i, j in pairs:
        if prev is None or j != prev + 1:
            chunks += 1
        prev = j
    return m, chunks


def approximate_meteor(gts: Dict, res: Dict,
                       alpha: float = 0.9, beta: float = 3.0,
                       gamma: float = 0.5) -> Tuple[float, List[float]]:
    """Pure-python METEOR approximation (exact+stem modules, METEOR 1.0
    parameterization).  NOT byte-identical to meteor-1.5.jar."""
    ids = sorted(gts.keys(), key=str)
    scores = []
    for i in ids:
        hyp = res[i][0].split()
        best = 0.0
        for ref_str in gts[i]:
            ref = ref_str.split()
            m, chunks = _align(hyp, ref)
            if m == 0 or not hyp or not ref:
                score = 0.0
            else:
                p = m / len(hyp)
                r = m / len(ref)
                fmean = p * r / (alpha * p + (1 - alpha) * r)
                frag = chunks / m
                score = fmean * (1 - gamma * frag ** beta)
            best = max(best, score)
        scores.append(best)
    return sum(scores) / len(scores), scores


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float], str]:
    """Returns (score, per-id, backend).

    A broken jar setup (jar present but its data/ missing, java dying
    mid-protocol, non-numeric output) falls back to the python
    approximation instead of aborting the whole eval."""
    if jar_available():
        scorer = None
        try:
            scorer = JarMeteor()
            score, scores = scorer.compute_score(gts, res)
            return score, scores, "meteor-1.5.jar"
        except (ValueError, OSError, BrokenPipeError) as e:
            import logging
            logging.getLogger(__name__).warning(
                "meteor jar failed (%s); using python approximation", e)
        finally:
            if scorer is not None:
                scorer.proc.kill()
                scorer.proc.wait()
    score, scores = approximate_meteor(gts, res)
    return score, scores, "python-approximation"
