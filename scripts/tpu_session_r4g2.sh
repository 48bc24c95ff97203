#!/usr/bin/env bash
# Round-4 session-6 follow-up: "16,16,32,32" (stage3 m=2) beat the shipped
# global 16 by 1.084x interleaved (tpu_session_r4g.sh) while deeper
# stage1/stage2 merges lost (0.989x/0.982x).  Chain the ladder one rung
# further from the new winner: stage3 m=4 and stage4 m=2; then re-read the
# per-stage table under the winning spec.
# Usage: bash scripts/tpu_session_r4g2.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4g2}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/session.log"
  local t0=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/session.log"
  tail -10 "$OUT/$name.out" | tee -a "$OUT/session.log"
  return $rc
}

run health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" || {
  echo "tunnel unhealthy — aborting session" | tee -a "$OUT/session.log"; exit 1; }

run ab_stage3_m4 1200 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 16,16,64,32 --ab-groupmerge-vs 16,16,32,32

run ab_stage4_m2 1200 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 16,16,32,64 --ab-groupmerge-vs 16,16,32,32

run confirm_vs_native 1200 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 16,16,32,32 --ab-groupmerge-vs 0

BIST_GROUP_CH=16,16,32,32 run stages_winner 2400 \
    python scripts/bench_extractor_stages.py --batch 128 --bf16 1 \
    --iters 3 --reps 3

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
