#!/usr/bin/env python
"""Evaluation entry point — the stage-3 equivalent of the reference's
dstc7avsd_eval/dstc7avsd_eval.sh, fully in-process python3 (no git clone, no
python2, no Java; see bist_tpu.evalkit).

Usage: python evaluate.py result1.json [result2.json ...]
Writes resultN.eval next to each input and prints the same awk-style summary
(dstc7avsd_eval.sh:31-32)."""

import argparse
import os
import sys

from bist_tpu.cli import repo_root

DEFAULT_MULTIREF = os.path.join(
    repo_root(),
    "dstc7avsd_eval", "data", "test_set4DSTC7-AVSD_multiref.json")
REFERENCE_MULTIREF = "/root/reference/dstc7avsd_eval/data/test_set4DSTC7-AVSD_multiref.json"


def main(argv=None):
    p = argparse.ArgumentParser(description="DSTC7-AVSD objective evaluation")
    p.add_argument("results", nargs="+", help="result JSON file(s)")
    p.add_argument("--reference", default=None,
                   help="COCO-format multi-reference ground truth JSON")
    p.add_argument("--stopwords", "-s", default=None,
                   help="stopword filter file (default: strip , and .)")
    p.add_argument("--last", "-l", action="store_true", default=True,
                   help="score only last answers per dialog (default true)")
    p.add_argument("--all-turns", dest="last", action="store_false")
    p.add_argument("--meteor-synonyms", default=None, metavar="FILE",
                   help="synonym groups file (one space-separated group per "
                        "line, .gz ok) — activates METEOR's WordNet synonym "
                        "stage; see bist_tpu/evalkit/meteor.py for the "
                        "format and a WordNet dump recipe")
    p.add_argument("--meteor-paraphrase", default=None, metavar="FILE",
                   help="paraphrase table ('a ||| b' or TSV per line, .gz "
                        "ok) — activates METEOR's paraphrase stage")
    args = p.parse_args(argv)

    multiref = args.reference
    if multiref is None:
        for cand in (DEFAULT_MULTIREF, REFERENCE_MULTIREF):
            if os.path.exists(cand):
                multiref = cand
                break
    if multiref is None:
        p.error("no multi-reference ground truth found; pass --reference")

    from bist_tpu.evalkit.harness import METRIC_ORDER, evaluate_result_file

    tables = None
    if args.meteor_synonyms or args.meteor_paraphrase:
        from bist_tpu.evalkit.meteor import MeteorTables

        tables = MeteorTables.load(synonyms=args.meteor_synonyms,
                                   paraphrase=args.meteor_paraphrase)

    for result in args.results:
        print(f"Result: {result}")
        corpus = evaluate_result_file(result, multiref,
                                      stopwords_path=args.stopwords,
                                      last_only=args.last,
                                      meteor_tables=tables)
        print("--- summary ---")
        for m in METRIC_ORDER:
            print("%s: %.3f" % (m, corpus[m]))
        print("---------------")


if __name__ == "__main__":
    main()
