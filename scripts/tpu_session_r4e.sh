#!/usr/bin/env bash
# Round-4 session-4 on-chip measurements:
#  - bench.py rehearsal under the moved defaults (scan_unroll=8): the
#    driver-capture dry run for BENCH_r04.json
#  - per-stage extractor timing (scripts/bench_extractor_stages.py):
#    the per-stage MFU table that either exposes the next extractor
#    lever or closes VERDICT r3 #8 the way decode_op_budget closed #5
# Usage: bash scripts/tpu_session_r4e.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4e}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/session.log"
  local t0=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/session.log"
  tail -6 "$OUT/$name.out" | tee -a "$OUT/session.log"
  return $rc
}

run health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((256,256),jnp.bfloat16)@jnp.ones((256,256),jnp.bfloat16)).sum()))" || {
  echo "tunnel unhealthy — aborting session" | tee -a "$OUT/session.log"; exit 1; }

run benchpy 3600 python bench.py

run extractor_stages 5400 python scripts/bench_extractor_stages.py \
    --batch 128 --bf16 1 --iters 3 --reps 3

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
