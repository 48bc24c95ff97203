#!/usr/bin/env bash
# Round-4 session-6 decider measurements: per-STAGE merge depths.
# Global BIST_GROUP_CH=16 shipped (1.116x, BENCH.md r4f) = per-stage merge
# factors m=4/2/1/1.  Global 32 read 1.049x, but that entangles stage1 m=8,
# stage2 m=4 and stage3 m=2.  The per-stage spec ("t4,t8,t16,t32") now lets
# each stage move independently; these A/Bs disentangle which stage wanted
# the deeper merge, head-to-head against the shipped default in one window.
# Also re-runs the per-stage MFU table UNDER the shipped merge (the r4f
# table was native) — note its FLOP column counts the padded (merged)
# program, so merged-stage MFU rows read lane-fill, not useful, MFU.
# Usage: bash scripts/tpu_session_r4g.sh [outdir]

set -u
OUT="${1:-/tmp/tpu_r4g}"
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

run stages_merged 2400 python scripts/bench_extractor_stages.py \
    --batch 128 --bf16 1 --iters 3 --reps 3

run ab_stage1_m8 2400 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 32,16,16,32 --ab-groupmerge-vs 16

run ab_stage2_m4 2400 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 16,32,16,32 --ab-groupmerge-vs 16

run ab_stage3_m2 2400 python scripts/bench_extractor.py --batch 128 \
    --bf16 1 --iters 3 --reps 3 \
    --ab-groupmerge 16,16,32,32 --ab-groupmerge-vs 16

echo "session complete; outputs in $OUT" | tee -a "$OUT/session.log"
