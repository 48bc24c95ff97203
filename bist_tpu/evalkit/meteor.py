"""METEOR (exact + stem matcher approximation).

The reference harness shells out to the METEOR 1.5 Java jar inside
coco-caption (dstc7avsd_eval stage 3), which matches on four module stages:
exact, stem (Snowball), synonym (WordNet) and paraphrase (paraphrase-en.gz).
This environment has neither the jar nor the WordNet/paraphrase data files
(zero egress), so this implementation covers the exact + stem stages with the
METEOR 1.5 English parameters — scores land close to but slightly below the
jar (missing synonym/paraphrase credit); the golden-regression test asserts a
documented tolerance band rather than equality.

Scoring (Denkowski & Lavie 2014, en defaults):
  alpha=0.85, beta=0.2, gamma=0.6, delta=0.75; content/function word
  discrimination with weights (exact 1.0, stem 0.6);
  P = Σw_i·m_i(h) / Σw_i·h_i,  R = Σw_i·m_i(r) / Σw_i·r_i  (weighted by
  content/function: w_content=delta, w_function=1-delta)
  F = P·R / (alpha·P + (1−alpha)·R)
  frag = chunks / matches;  penalty = gamma · frag^beta
  score = max over references of (1 − penalty) · F
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

try:
    from nltk.stem.porter import PorterStemmer
    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover
    _STEM = lambda w: w

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_EXACT, W_STEM = 1.0, 0.6

# METEOR's English function-word list (frequency-derived); approximated with
# the common closed-class words — affects only the content/function weighting.
FUNCTION_WORDS = {
    "a", "an", "the", "in", "on", "at", "to", "of", "is", "are", "was",
    "were", "be", "been", "being", "am", "do", "does", "did", "have",
    "has", "had", "i", "you", "he", "she", "it", "we", "they", "his",
    "her", "its", "their", "my", "your", "our", "and", "or", "but", "if",
    "as", "by", "with", "for", "from", "that", "this", "these", "those",
    "there", "here", "not", "no", "so", "than", "then", "too", "very",
    "can", "could", "will", "would", "shall", "should", "may", "might",
    "must", "up", "down", "out", "off", "over", "under",
}


def _align(hyp: List[str], ref: List[str]):
    """Greedy stage-wise alignment: exact first, then stem, left-to-right.
    Returns list of (hyp_idx, ref_idx, weight)."""
    matches = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    # exact
    for i, hw in enumerate(hyp):
        for j, rw in enumerate(ref):
            if not used_h[i] and not used_r[j] and hw == rw:
                matches.append((i, j, W_EXACT))
                used_h[i] = used_r[j] = True
                break
    # stem
    hyp_stem = [_STEM(w) for w in hyp]
    ref_stem = [_STEM(w) for w in ref]
    for i, hs in enumerate(hyp_stem):
        if used_h[i]:
            continue
        for j, rs in enumerate(ref_stem):
            if not used_r[j] and hs == rs:
                matches.append((i, j, W_STEM))
                used_h[i] = used_r[j] = True
                break
    return sorted(matches)


def _chunks(matches) -> int:
    """Number of contiguous monotone chunks in the alignment."""
    if not matches:
        return 0
    ms = sorted(matches)
    chunks = 1
    for (i0, j0, _), (i1, j1, _) in zip(ms, ms[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return chunks


def _wsum(words: Sequence[str]) -> float:
    return sum(1.0 - DELTA if w in FUNCTION_WORDS else DELTA for w in words)


def meteor_single(hyp: Sequence[str], refs: Sequence[Sequence[str]]) -> float:
    best = 0.0
    hyp = list(hyp)
    for ref in refs:
        ref = list(ref)
        matches = _align(hyp, ref)
        if not matches:
            continue
        mh = _wsum([hyp[i] for i, _, _ in matches])
        mr = _wsum([ref[j] for _, j, _ in matches])
        th, tr = _wsum(hyp), _wsum(ref)
        if th == 0 or tr == 0:
            continue
        p, r = mh / th, mr / tr
        if p == 0 or r == 0:
            continue
        f = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = _chunks(matches) / len(matches)
        score = (1 - GAMMA * frag ** BETA) * f
        best = max(best, score)
    return best


def meteor_corpus(hyps: List[Sequence[str]],
                  refs_list: List[List[Sequence[str]]]
                  ) -> Tuple[float, List[float]]:
    scores = [meteor_single(h, rs) for h, rs in zip(hyps, refs_list)]
    return (sum(scores) / len(scores) if scores else 0.0), scores
