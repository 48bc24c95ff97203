#!/bin/bash
# Stage runner — CLI-compatible with the reference scripts/exec.sh:
#   ./scripts/exec.sh <device> <stage> <test_mode> [nb_workers]
#   stage 1 = train, 2 = generate, 3 = evaluate
# Any variable below is overridable as --name value (Kaldi-style
# parse_options, scripts/parse_options.sh).

device=$1
stage=$2
test_mode=$3
nb_workers=${4:-0}
# consume the positionals so parse_options sees only --name value overrides
shift $(( $# < 4 ? $# : 4 ))

# data setting
decode_data=off
undisclosed_only=1
data_root=${DATA_ROOT:-../../../data/dstc7/}
fea_dir=$data_root
fea_file="<FeaType>/<ImageID>.npy"
fea_type=resnext_st
fea_names=resnext
include_caption=summary

# model setting (reference exec.sh:21-29 defaults)
t2s=1
s2t=1
d_model=128
att_h=8
nb_blocks=3
nb_venc_blocks=3
nb_cenc_blocks=3
nb_aenc_blocks=0
d_ff=$(( d_model*4 ))

# training setting
num_epochs=50
warmup_steps=13000
dropout=0.2
attn_dropout=0.1
batch_size=32
grad_accum=1
bf16=0
feat_int8=0
seed=1
model_prefix=mtn
expid=${fea_names}_${include_caption}

if [ "$test_mode" = true ]; then
    expdir=exps_test/${expid}
else
    expdir=exps/${expid}
fi
report_interval=100

# generation setting
decode_style=beam_search
penalty=1.0
beam=5
nbest=5
model_epoch=best
gen_batch_size=32
cache_dtype=float32   # bfloat16 = the 1.68x serving cache (BENCH.md)

echo Stage $stage Test Mode $test_mode Exp ID $expid

workdir=$(pwd)
labeled_test=''
if [ "$test_mode" = true ]; then
  train_set=$data_root/train_test.json
  valid_set=$data_root/valid_test.json
  test_set=$data_root/test_test.json
  labeled_test=$data_root/test_test.json
  eval_set=${labeled_test}
  undisclosed_only=0
  nb_blocks=1
  num_epochs=1
else
  train_set=$data_root/train_set4DSTC7-AVSD.json
  valid_set=$data_root/valid_set4DSTC7-AVSD.json
  test_set=$data_root/test_set.json
  labeled_test=$data_root/test_set.json
  if [ "$decode_data" = off ]; then
    test_set=$data_root/test_set4DSTC7-AVSD.json
    labeled_test=$data_root/lbl_test_set4DSTC7-AVSD.json
    eval_set=${labeled_test}
    if [ $undisclosed_only -eq 1 ]; then
        eval_set=$data_root/lbl_undiscloseonly_test_set4DSTC7-AVSD.json
    fi
  fi
fi
echo Exp Directory $expdir

. "$(dirname "$0")/parse_options.sh" || exit 1

set -e
set -u
set -o pipefail

mkdir -p $expdir
if [ $stage -eq 1 ]; then
    echo -------------------------
    echo stage 1: model training
    echo -------------------------
    python train.py \
      --fea-type $fea_type \
      --train-path "$fea_dir/$fea_file" \
      --train-set $train_set \
      --valid-path "$fea_dir/$fea_file" \
      --valid-set $valid_set \
      --test-set $test_set \
      --num-epochs $num_epochs \
      --batch-size $batch_size \
      --model $expdir/$model_prefix \
      --rand-seed $seed \
      --report-interval $report_interval \
      --nb-blocks $nb_blocks \
      --include-caption $include_caption \
      --warmup-steps $warmup_steps \
      --d-model $d_model \
      --d-ff $d_ff \
      --att-h $att_h \
      --dropout $dropout \
      --nb-venc-blocks $nb_venc_blocks \
      --nb-cenc-blocks $nb_cenc_blocks \
      --nb-aenc-blocks $nb_aenc_blocks \
      --t2s $t2s --s2t $s2t \
      --attn-dropout $attn_dropout \
      --grad-accum $grad_accum \
      --bf16 $bf16 \
      --feat-int8 $feat_int8 \
      --num-workers $nb_workers \
      --device "$device"
fi

if [ $stage -eq 2 ]; then
    echo -----------------------------
    echo stage 2: generate responses
    echo -----------------------------
    for data_set in $test_set; do
        echo start response generation for $data_set
        target=$(basename ${data_set%.*})
        result=${expdir}/result_${target}_ep${model_epoch}_b${beam}_p${penalty}_n${nbest}.json
        python generate.py \
          --test-path "$fea_dir/$fea_file" \
          --test-set $data_set \
          --model-conf $expdir/${model_prefix}.conf \
          --model $expdir/${model_prefix} \
          --beam $beam \
          --penalty $penalty \
          --nbest $nbest \
          --output $result \
          --decode-style ${decode_style} \
          --undisclosed-only ${undisclosed_only} \
          --labeled-test "${labeled_test}" \
          --gen-batch-size ${gen_batch_size} \
          --cache-dtype ${cache_dtype} \
          --device "$device"
    done
fi

if [ $stage -eq 3 ]; then
    echo --------------------------
    echo stage 3: score results
    echo --------------------------
    for data_set in $eval_set; do
        echo start evaluation for $data_set
        save_target=$(basename ${test_set%.*})
        result=${expdir}/result_${save_target}_ep${model_epoch}_b${beam}_p${penalty}_n${nbest}.json
        python evaluate.py "$result"
    done
fi
