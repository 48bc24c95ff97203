#!/bin/bash
# DSTC7-AVSD objective evaluation — drop-in replacement for the reference
# dstc7avsd_eval/dstc7avsd_eval.sh, with the same usage and artifact contract
# (result.json → result.eval + printed summary) but fully in-process python3
# (no git clone of coco-caption, no python2, no Java).

if [ $# -lt 1 ]; then
    echo "DSTC7-AVSD objective evaluation"
    echo "Usage: dstc7avsd_eval.sh result1.json [result2.json ..]"
    echo " output: result1.eval [result2.eval ..]"
    exit
fi

here=$(cd "$(dirname "$0")" && pwd)
python "$here/../evaluate.py" \
  --reference "$here/data/test_set4DSTC7-AVSD_multiref.json" \
  --stopwords "$here/data/stopwords.txt" \
  "$@"
