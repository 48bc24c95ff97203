#!/bin/bash
# Full-pipeline learning demonstration: train the BiST model on a synthetic
# caption-copy task (answers = first 4 words of each dialog's summary — a
# rule that exercises the multi-pointer generator's copy path), beam-decode a
# HELD-OUT split, and score with the real evaluation harness.
#
# Expected (8 epochs, d_model=64): Bleu_4 ≈ 0.89, ROUGE_L ≈ 0.96, CIDEr ≈ 8.9
# on unseen dialogs — the model must genuinely copy from captions it has
# never seen, not memorise.
#
# Usage: ./scripts/demo_learning.sh [workdir] [device]   (device '' = TPU)

set -e
work=${1:-$(mktemp -d)/copytask}
device=${2:-}

python scripts/make_synth_data.py "$work" --n-dialogs 400 --n-turns 3 \
  --ft-dim 64 --copy-task --separate-splits --multiref

python train.py \
  --fea-type resnext_st \
  --train-path "$work/<FeaType>/<ImageID>.npy" --train-set "$work/train.json" \
  --valid-path "$work/<FeaType>/<ImageID>.npy" --valid-set "$work/valid.json" \
  --model "$work/exp/mtn" --num-epochs 8 --batch-size 32 \
  --nb-blocks 2 --nb-venc-blocks 2 --nb-cenc-blocks 2 \
  --d-model 64 --att-h 8 --include-caption summary \
  --warmup-steps 200 --report-interval 20 --cutoff 0 --dropout 0.1 \
  --device "$device"

python generate.py \
  --test-path "$work/<FeaType>/<ImageID>.npy" --test-set "$work/test.json" \
  --model "$work/exp/mtn" --model-conf "$work/exp/mtn.conf" \
  --beam 5 --penalty 1.0 --nbest 5 --decode-style beam_search \
  --output "$work/result.json" --gen-batch-size 32 --device "$device"

python evaluate.py "$work/result.json" --reference "$work/test_multiref.json"
