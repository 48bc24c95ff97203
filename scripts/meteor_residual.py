#!/usr/bin/env python
"""METEOR residual decomposition on the DSTC7 golden fixtures (VERDICT r3 #7).

evalkit's METEOR implements the exact + stem matcher stages of the METEOR
1.5 jar; the synonym (WordNet) and paraphrase (paraphrase-en.gz) stages are
impossible in this environment (no data, zero egress).  Those stages can
only ADD matches, so our score is a one-sided LOWER BOUND on the jar's
(bist_tpu/evalkit/meteor.py docstring).  This script quantifies how much of
the remaining residual the missing stages can possibly explain:

  * lower bound  — evalkit METEOR as shipped (exact + stem);
  * golden       — the jar's score from the committed .eval fixtures;
  * ceiling      — evalkit METEOR where, after exact/stem alignment, every
    remaining unmatched hyp word may match ANY remaining unmatched ref word
    at the synonym weight (w_syn = 0.8), appended monotonically (greedy by
    ref order) so the chunk penalty stays conservative.  No real synonym
    table can match more than "everything matches", so jar ≤ ceiling must
    hold if the residual is purely the missing matchers.

If  lower ≤ golden ≤ ceiling  on every fixture, the residual is attributable
to the WordNet-only stages; any fixture violating it would indicate an
aligner/scoring defect instead.  Results are recorded in BENCH.md.

Usage: python scripts/meteor_residual.py
"""

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bist_tpu.evalkit import meteor as M                     # noqa: E402
from bist_tpu.evalkit.harness import (                       # noqa: E402
    StopwordFilter, get_hypotheses, load_coco_refs, ptb_tokenize)

EVAL_DIR = os.path.join(HERE, "dstc7avsd_eval")
FIXTURES = ["baseline_i3d_rgb-i3d_flow", "baseline_i3d_rgb-i3d_flow-vggish"]
W_SYN = 0.8      # METEOR 1.5 en synonym-module weight


def ceiling_single(hyp, refs):
    """meteor_single, plus free synonym matches for every leftover pair."""
    best = 0.0
    hyp = list(hyp)
    for ref in refs:
        ref = list(ref)
        matches = M._align(hyp, ref)
        used_h = {i for i, _, _ in matches}
        used_r = {j for _, j, _ in matches}
        free_h = [i for i in range(len(hyp)) if i not in used_h]
        free_r = [j for j in range(len(ref)) if j not in used_r]
        extra = [(i, j, W_SYN) for i, j in zip(free_h, free_r)]
        all_m = sorted(matches + extra)
        mh = sum(w * M._cw(hyp[i]) for i, _, w in all_m)
        mr = sum(w * M._cw(ref[j]) for _, j, w in all_m)
        th, tr = M._wsum(hyp), M._wsum(ref)
        if not all_m or th == 0 or tr == 0:
            continue
        p, r = mh / th, mr / tr
        if p == 0 or r == 0:
            continue
        f = p * r / (M.ALPHA * p + (1 - M.ALPHA) * r)
        frag = M._chunks(all_m) / len(all_m)
        best = max(best, (1 - M.GAMMA * frag ** M.BETA) * f)
    return best


def main():
    print("| fixture | lower (exact+stem) | golden (jar) | ceiling "
          "(free synonymy) | residual | residual/ceiling headroom |")
    print("|---|---|---|---|---|---|")
    ok = True
    for name in FIXTURES:
        golden = None
        for ln in open(f"{EVAL_DIR}/sample/{name}.eval"):
            m = re.match(r"^METEOR: ([\d.]+)", ln)
            if m:
                golden = float(m.group(1))
                break
        result = json.load(open(f"{EVAL_DIR}/sample/{name}.json"))
        hyps_j = get_hypotheses(
            result, last_only=True,
            swfilter=StopwordFilter(f"{EVAL_DIR}/data/stopwords.txt"))
        refs_raw = load_coco_refs(
            f"{EVAL_DIR}/data/test_set4DSTC7-AVSD_multiref.json")
        hyp_raw = {int(h["image_id"]): [h["caption"]] for h in hyps_j}
        ids = sorted(hyp_raw)
        hyp_tok = ptb_tokenize(hyp_raw)
        ref_tok = ptb_tokenize({i: refs_raw[i] for i in ids})
        hyps = [hyp_tok[i][0].split() for i in ids]
        refs = [[r.split() for r in ref_tok[i]] for i in ids]

        lower, _ = M.meteor_corpus(hyps, refs)
        ceil = sum(ceiling_single(h, rs) for h, rs in zip(hyps, refs)) \
            / len(hyps)
        bracket = lower - 5e-4 <= golden <= ceil + 5e-4
        ok &= bracket
        print(f"| {name} | {lower:.4f} | {golden:.4f} | {ceil:.4f} | "
              f"{golden - lower:+.4f} | "
              f"{(ceil - golden):+.4f} {'OK' if bracket else 'VIOLATION'} |")
    print()
    print("bracketed on every fixture" if ok else "BRACKET VIOLATION — "
          "residual is NOT explained by the missing matchers alone")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
