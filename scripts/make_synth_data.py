#!/usr/bin/env python
"""Synthesize a tiny AVSD-format dataset + features for smoke tests.

Role-equivalent to the reference's test_mode fixture files
(train_test.json / valid_test.json / test_test.json, scripts/exec.sh:60-69),
which ship with the reference's external data download.  Generates:
  <out>/train_test.json, valid_test.json, test_test.json
  <out>/resnext_st/<ImageID>.npy       (T, 16, D) spatio-temporal grids
  <out>/vggish/<ImageID>.npy           (T, 128) audio features (optional)

Usage: python scripts/make_synth_data.py <out_dir> [--n-dialogs 8]
       [--ft-dim 256] [--audio] [--seed 0]
"""

import argparse
import json
import os

import numpy as np

WORDS = ("a the man woman is are sitting standing walking holding cup dog cat "
         "couch table room video he she they what doing where when how many "
         "yes no there one two three people watching tv drinking eating "
         "opens door closes picks up puts down camera towards away looks").split()


def sent(rng, lo=4, hi=12):
    return " ".join(rng.choice(WORDS, rng.integers(lo, hi)))


def make_split(rng, n_dialogs, n_turns, vid_prefix, undisclosed=False,
               copy_task=False):
    """copy_task: answers are deterministically the first 4 words of the
    dialog's summary — a learnable rule that specifically exercises the
    multi-pointer generator's caption-copy path."""
    dialogs = []
    for d in range(n_dialogs):
        summary = sent(rng, 6, 12)
        turns = []
        for t in range(n_turns):
            if undisclosed and t == n_turns - 1:
                ans = "__UNDISCLOSED__"
            elif copy_task:
                ans = " ".join(summary.split()[:4])
            else:
                ans = sent(rng, 3, 9)
            turns.append({"question": sent(rng, 4, 10), "answer": ans})
        dialogs.append({
            "image_id": f"{vid_prefix}{d:04d}",
            "caption": sent(rng, 8, 16),
            "summary": summary,
            "dialog": turns,
        })
    return {"dialogs": dialogs, "type": "synthetic", "version": "1.0"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--n-dialogs", type=int, default=8)
    p.add_argument("--n-turns", type=int, default=3)
    p.add_argument("--ft-dim", type=int, default=256)
    p.add_argument("--spatial", type=int, default=16)
    p.add_argument("--audio", action="store_true")
    p.add_argument("--copy-task", action="store_true",
                   help="answers = first 4 words of the summary (learnable)")
    p.add_argument("--separate-splits", action="store_true",
                   help="distinct dialogs per split (instead of the tiny "
                        "shared-video test_mode layout)")
    p.add_argument("--multiref", action="store_true",
                   help="also write test_multiref.json (COCO format) for "
                        "evaluate.py --reference")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    vids = []
    splits = {}
    for i, (name, undisc) in enumerate((("train_test", False),
                                        ("valid_test", False),
                                        ("test_test", False))):
        prefix = f"SYN{i}" if args.separate_splits else "SYN"
        n = args.n_dialogs if (args.separate_splits and i == 0) \
            else (max(args.n_dialogs // 4, 2) if args.separate_splits
                  else args.n_dialogs)
        split = make_split(rng, n, args.n_turns, prefix,
                           undisclosed=undisc, copy_task=args.copy_task)
        splits[name] = split
        with open(os.path.join(args.out_dir, name + ".json"), "w") as f:
            json.dump(split, f, indent=1)
        if args.separate_splits:
            # also write without the "_test" marker: full-size splits (the
            # loader caps *_test.json files at 100 QA, data_handler.py:108)
            full = name.split("_")[0] + ".json"
            with open(os.path.join(args.out_dir, full), "w") as f:
                json.dump(split, f, indent=1)
        vids.extend(d["image_id"] for d in split["dialogs"])
    vids = sorted(set(vids))

    if args.multiref:
        # COCO-format ground truth over the test split's LAST turns, ids in
        # dialog order (matching evalkit.get_hypotheses -l numbering)
        anns, imgs = [], []
        for i, d in enumerate(splits["test_test"]["dialogs"], start=1):
            imgs.append({"name": f"{d['image_id']}_{args.n_turns - 1}",
                         "id": i})
            anns.append({"image_id": i, "id": i,
                         "caption": d["dialog"][-1]["answer"]})
        with open(os.path.join(args.out_dir, "test_multiref.json"), "w") as f:
            json.dump({"info": {}, "licenses": [], "images": imgs,
                       "type": "captions", "annotations": anns}, f, indent=1)

    ftdir = os.path.join(args.out_dir, "resnext_st")
    os.makedirs(ftdir, exist_ok=True)
    for vid in vids:
        T = int(rng.integers(4, 12))
        np.save(os.path.join(ftdir, vid + ".npy"),
                rng.standard_normal((T, args.spatial, args.ft_dim))
                .astype(np.float32))
    if args.audio:
        # both dirs: training reads 'vggish', generation's test-time override
        # reads 'vggish_testset' (reference generate.py:101-104)
        for dname in ("vggish", "vggish_testset"):
            adir = os.path.join(args.out_dir, dname)
            os.makedirs(adir, exist_ok=True)
            for vid in vids:
                T = int(rng.integers(4, 12))
                np.save(os.path.join(adir, vid + ".npy"),
                        rng.standard_normal((T, 128)).astype(np.float32))
    print(f"wrote synthetic AVSD data to {args.out_dir} ({len(vids)} videos)")


if __name__ == "__main__":
    main()
