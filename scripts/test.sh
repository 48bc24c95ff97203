#!/bin/bash
# Test-mode smoke pipeline — role-equivalent to the reference scripts/test.sh:
# run all three stages end-to-end on tiny data.
#
# Usage: ./scripts/test.sh [device] [data_root]
# With no data_root, synthesizes a tiny AVSD-format dataset first.

set -e
device=${1:-}
data_root=${2:-}

if [ -z "$data_root" ]; then
  data_root=$(mktemp -d)/avsd_test
  python scripts/make_synth_data.py "$data_root" --n-dialogs 6 --ft-dim 64
fi

export DATA_ROOT=$data_root
common=(--d_model 32 --att_h 4 --warmup_steps 20 --batch_size 8
        --report_interval 1 --nb_venc_blocks 1 --nb_cenc_blocks 1)

bash scripts/exec.sh "$device" 1 true 0 "${common[@]}"
bash scripts/exec.sh "$device" 2 true 0 --gen_batch_size 8
bash scripts/exec.sh "$device" 3 true 0
echo "test.sh: all three stages completed"
