"""METEOR.

The reference scores METEOR through pycocoevalcap's Java meteor-1.5.jar
(densevid_eval/para-evaluate.py via the coco-caption submodule — which is
EMPTY in the reference checkout, so the jar must be supplied externally
there too).  Two backends:

  * ``JarMeteor``: byte-identical scoring by shelling out to the same jar
    when one is available (set SVPC_METEOR_JAR or place meteor-1.5.jar
    next to this file);
  * ``approximate_meteor``: a documented pure-python approximation used
    when no jar/JVM exists, implementing METEOR **1.5** en-norm semantics
    (Denkowski & Lavie 2014): alpha=.85, beta=.2, gamma=.6, delta=.75,
    function-word discrimination with module weights exact=1.0, stem=0.6
    (synonym=0.8 only when a local WordNet corpus is importable — it is
    not on this host, and the paraphrase table is jar-only data, so those
    two modules are the known structural gap vs the jar).  Clearly
    labeled: parity claims apply only to the jar backend.

Fallback-vs-jar delta: not measurable on this host (no JVM, no jar, no
network egress — verified 2026-08-17); the jar-gated regression test
``tests/test_metrics.py::test_meteor_fixture_jar_delta`` measures |mean Δ|
on the checked-in fixture whenever a jar IS available and asserts ≤ 0.03.
On hosts without a jar the fixture pins the approximation's exact values
so drift in the fallback itself is still caught.
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
        def clean(s: str) -> str:
            # the jar speaks a line-oriented '|||'-delimited protocol: a
            # delimiter or newline inside ANY field (pycocoevalcap only
            # scrubs the hypothesis) desyncs every readline after it
            return " ".join(s.replace("|||", " ").split())

        score_line = " ||| ".join(
            ("SCORE", " ||| ".join(clean(r) for r in references),
             clean(hypothesis)))
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


try:  # synonym module only when a local WordNet corpus exists (it
    # requires downloaded nltk data — absent on this host; gated, never
    # fetched)
    from nltk.corpus import wordnet as _WORDNET
    _WORDNET.synsets("test")
except Exception:  # pragma: no cover
    _WORDNET = None


def _synonym_set(word: str) -> frozenset:
    if _WORDNET is None:
        return frozenset((word,))
    lemmas = {word}
    for syn in _WORDNET.synsets(word):
        lemmas.update(l.name().lower() for l in syn.lemmas())
    return frozenset(lemmas)


# METEOR's function/en.words is corpus-frequency derived (relative
# frequency > 1e-3); this is a hand-curated stand-in of the same
# closed-class inventory: articles, prepositions, conjunctions, pronouns,
# auxiliaries, common adverbial particles and punctuation.
_FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both either
neither and or but nor so yet for if then than as because while when
where after before until unless although though since whether once
of in on at by with from to into onto over under above below between
among through during against about around off out up down near
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself
ourselves themselves who whom whose which what
is are was were be been being am do does did done doing have has had
having will would shall should can could may might must ought
not n't no nor never also just only very too quite rather there here
now then again further once
. , ; : ! ? ' " ` `` '' - -- ( ) [ ] { }
""".split())


def _is_content(word: str) -> bool:
    return word not in _FUNCTION_WORDS


# (module, weight) stages in METEOR 1.5 priority order; paraphrase is
# jar-only data and intentionally absent.
def _stages():
    out = [("exact", 1.0), ("stem", 0.6)]
    if _WORDNET is not None:
        out.append(("synonym", 0.8))
    return out


def _align(hyp: List[str], ref: List[str]):
    """Greedy staged alignment (exact > stem > synonym).

    Returns (pairs, chunks) where pairs is a list of
    ``(hyp_idx, ref_idx, module_weight)`` and chunks counts runs of
    matches contiguous in BOTH sentences (METEOR's chunk definition).
    The real aligner beam-searches to maximize matches then minimize
    chunks; the approximation here is greedy with a contiguity
    preference — among equally-valid ref candidates (duplicate words),
    pick the one directly after the previous hyp word's match, so chunk
    counts aren't inflated by arbitrary duplicate choices.
    """
    matched_h = [-1] * len(hyp)
    weight_h = [0.0] * len(hyp)
    used_r = [False] * len(ref)
    # stem each sentence once, not once per (unmatched hyp word × ref
    # word) — the stemmer is the hot loop of multi-reference scoring
    ref_stems = [_porter_stem(rw) for rw in ref]
    for stage, w in _stages():
        for i, hw in enumerate(hyp):
            if matched_h[i] >= 0:
                continue
            if stage == "exact":
                pred = lambda j: hw == ref[j]
            elif stage == "stem":
                key = _porter_stem(hw)
                pred = lambda j: key == ref_stems[j]
            else:
                syns = _synonym_set(hw)
                pred = lambda j: ref[j] in syns or hw in _synonym_set(ref[j])
            cands = [j for j in range(len(ref))
                     if not used_r[j] and pred(j)]
            if not cands:
                continue
            after_prev = matched_h[i - 1] + 1 if i > 0 else -1
            if after_prev in cands:
                j = after_prev
            else:
                j = min(cands)
            matched_h[i] = j
            weight_h[i] = w
            used_r[j] = True
    pairs = [(i, j, weight_h[i])
             for i, j in enumerate(matched_h) if j >= 0]
    chunks = 0
    prev = None
    for i, j, _ in pairs:
        if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
            chunks += 1
        prev = (i, j)
    return pairs, chunks


def _score_sentence(hyp: List[str], ref: List[str],
                    alpha: float, beta: float, gamma: float,
                    delta: float) -> float:
    """METEOR 1.5 sentence score: content/function-weighted P and R over
    module-weighted matches, harmonic fmean, fragmentation penalty."""
    if not hyp or not ref:
        return 0.0
    pairs, chunks = _align(hyp, ref)
    m = len(pairs)
    if m == 0:
        return 0.0
    cw = lambda word: delta if _is_content(word) else 1.0 - delta
    p_num = sum(w * cw(hyp[i]) for i, _, w in pairs)
    r_num = sum(w * cw(ref[j]) for _, j, w in pairs)
    p_den = sum(cw(w) for w in hyp)
    r_den = sum(cw(w) for w in ref)
    if p_den == 0.0 or r_den == 0.0:
        return 0.0
    p = p_num / p_den
    r = r_num / r_den
    if p + r == 0.0:
        return 0.0
    fmean = p * r / (alpha * p + (1.0 - alpha) * r)
    frag = chunks / m
    return fmean * (1.0 - gamma * frag ** beta)


def approximate_meteor(gts: Dict, res: Dict,
                       alpha: float = 0.85, beta: float = 0.2,
                       gamma: float = 0.6, delta: float = 0.75,
                       ) -> Tuple[float, List[float]]:
    """Pure-python METEOR approximation with 1.5 en-norm parameterization
    (alpha=.85, beta=.2, gamma=.6, delta=.75, function-word weighting).
    NOT byte-identical to meteor-1.5.jar: greedy (not beam) alignment,
    curated function-word list, and no synonym/paraphrase modules unless
    WordNet data is locally importable."""
    ids = sorted(gts.keys(), key=str)
    if not ids:  # empty eval degrades to 0, not ZeroDivisionError
        return 0.0, []
    scores = []
    for i in ids:
        hyp = res[i][0].lower().split()
        best = 0.0
        for ref_str in gts[i]:
            best = max(best, _score_sentence(
                hyp, ref_str.lower().split(), alpha, beta, gamma, delta))
        scores.append(best)
    return sum(scores) / len(scores), scores


def compute_meteor(gts: Dict, res: Dict) -> Tuple[float, List[float], str]:
    """Returns (score, per-id, backend).

    The per-id list is ordered by ``sorted(gts.keys(), key=str)`` — i.e.
    LEXICOGRAPHIC id order, both backends — so integer ids ≥ 10 do NOT
    align with ``sorted(gts)``; zip against the same key=str ordering.

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
