#!/usr/bin/env bash
# Round-4 session-4 decider measurements:
#  - per-stage extractor table RERUN under the fixed FLOP accounting
#    (cost analysis counts a lax.scan body ONCE; the first run divided by
#    the trip count and under-read MFU 3x)
#  - block-diagonal group-merge A/B (BIST_GROUP_CH 16 and 32): does raising
#    grouped-conv output-lane fill x4/x8 at x4/x8 FLOPs beat the native
#    32-way grouped lowering on stages 1-2?  (First-order model: a wash.)
# Usage: bash scripts/tpu_session_r4f.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4f}"
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

run stages_fixed 2400 python scripts/bench_extractor_stages.py \
    --batch 128 --bf16 1 --iters 3 --reps 3

run groupmerge16 2400 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --ab-groupmerge 16 --iters 3 --reps 3

run groupmerge32 2400 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --ab-groupmerge 32 --iters 3 --reps 3

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
