#!/bin/bash
# TGIF-QA learning demonstration: synthesize a frameqa task whose answer is
# decodable from the video features alone (class-c gifs carry a +2 bump on
# channel block c), train through the real train_tgif.py CLI, and report
# HELD-OUT accuracy (chance = 25%).  The VideoQA analogue of
# demo_learning.sh for the dialogue model.
#
# Usage: ./scripts/demo_tgif.sh [workdir] [device]   (device '' = TPU)

set -e
work=${1:-$(mktemp -d)/tgif}
device=${2:-}
mkdir -p "$work/feats"

python - "$work" <<'PY'
import os, sys
import numpy as np

work = sys.argv[1]
rng = np.random.default_rng(0)
answers = ["red", "blue", "green", "yellow"]
D, T, S = 64, 8, 16
rows = []
for i in range(360):
    c = int(rng.integers(0, 4))
    g = f"g{i:04d}"
    ft = rng.standard_normal((T, S, D)).astype(np.float32)
    ft[..., c * 8:(c + 1) * 8] += 2.0
    np.save(os.path.join(work, "feats", g + ".npy"), ft)
    rows.append(f"{g}\twhat color is the thing\t{answers[c]}")
header = "gif_name\tquestion\tanswer"
with open(os.path.join(work, "train.tsv"), "w") as f:
    f.write("\n".join([header] + rows[:300]) + "\n")
with open(os.path.join(work, "test.tsv"), "w") as f:
    f.write("\n".join([header] + rows[300:]) + "\n")
print("synth tgif: 300 train / 60 held-out gifs")
PY

python train_tgif.py --task frameqa \
  --train-tsv "$work/train.tsv" --test-tsv "$work/test.tsv" \
  --feature-path "$work/feats/<ImageID>.npy" \
  --model "$work/exp/tgif" --num-epochs 6 --batch-size 32 \
  --d-model 32 --att-h 4 --nb-venc-blocks 2 --dropout 0.1 \
  --device "$device"
